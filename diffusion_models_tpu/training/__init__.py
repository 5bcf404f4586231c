from diffusion_models_tpu.training.trainer import Trainer, TrainState
from diffusion_models_tpu.training.conditional_trainers import (
    ImageConditionalTrainer,
    TextConditionalTrainer,
)
