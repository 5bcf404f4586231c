from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion, ModelPrediction
from diffusion_models_tpu.diffusion.image_conditional import (
    ImageConditionalGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.text_conditional import (
    TextConditionalGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.latent import (
    LatentDiffusion,
    ImageConditionalLatentDiffusion,
    TextConditionalLatentDiffusion,
)
from diffusion_models_tpu.diffusion.learned_variance import LearnedGaussianDiffusion
from diffusion_models_tpu.diffusion.continuous_time import (
    ContinuousTimeGaussianDiffusion,
    VParamContinuousTimeGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.weighted_objective import (
    WeightedObjectiveGaussianDiffusion,
)
from diffusion_models_tpu.diffusion.elucidated import ElucidatedDiffusion
from diffusion_models_tpu.diffusion.simple_diffusion import SimpleDiffusion
from diffusion_models_tpu.diffusion.cfg import CFGGaussianDiffusion, CFGUnet
from diffusion_models_tpu.diffusion.guided import (
    GuidedGaussianDiffusion,
    classifier_cond_fn,
)
from diffusion_models_tpu.diffusion.repaint import RePaintGaussianDiffusion
from diffusion_models_tpu.diffusion.diffusion_1d import (
    GaussianDiffusion1D,
    Dataset1D,
    Trainer1D,
)
