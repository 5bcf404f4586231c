"""REAL multi-process data parallelism: 2 actual processes joined by
`jax.distributed.initialize` on CPU, executing the Trainer's
`process_count > 1` branches (per-process DataLoader sharding +
`make_array_from_process_local_data` global-batch assembly), verified
against an equivalent single-process run.

The 8-fake-device mesh in conftest exercises the sharding math but always
with `process_count == 1`; this is the only test where the multi-host code
path actually runs (SURVEY.md §2.4 — the reference's scaling story is
`accelerate launch` multi-GPU, equally untested there)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest
import jax
from PIL import Image

from diffusion_models_tpu.diffusion.gaussian import GaussianDiffusion
from diffusion_models_tpu.models.unet import Unet
from diffusion_models_tpu.training.trainer import Trainer
from diffusion_models_tpu.utils.data import DataLoader, ImageFolderDataset


@pytest.fixture(scope="module")
def img_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("mp_imgs")
    rs = np.random.RandomState(0)
    for i in range(32):
        base = np.full((16, 16, 3), (i % 4) * 60, dtype=np.uint8)
        noise = rs.randint(0, 30, base.shape, dtype=np.uint8)
        Image.fromarray(base + noise).save(root / f"{i:03d}.png")
    return root


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_matches_single(img_folder, tmp_path):
    port = _free_port()
    worker = Path(__file__).parent / "multiprocess_worker.py"
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(pid), "2", str(port),
             str(img_folder), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    assert (tmp_path / "done").exists(), outs[0][-2000:]

    # the milestone eval ran under process_count == 2 (worker sets
    # save_and_sample_every=2): exactly ONE set of host-side artifacts in
    # the shared results folder (process-0 gating — reference
    # `is_main_process`, `denoising_diffusion.py:1023,1050,1101`), and the
    # Orbax checkpoint committed
    mp_results = tmp_path / "results_mp"
    assert (mp_results / "sample-1.png").exists()
    assert (mp_results / "training_params.json").exists()
    assert (mp_results / "model-1").exists(), "milestone ckpt not committed"

    # single-process reference with the SAME effective global batches:
    # the 2-process global batch is [shard0 ‖ shard1] (process p's local
    # rows land on device p), so feed the reference trainer concatenated
    # 2-shard DataLoader streams.
    model = Unet(dim=8, dim_mults=(1, 2), channels=3)
    diff = GaussianDiffusion(
        model, image_size=16, timesteps=10, sampling_timesteps=3,
        beta_schedule="cosine",
    )
    trainer = Trainer(
        diff, str(img_folder),
        train_batch_size=16, train_num_steps=3, train_lr=1e-3,
        save_and_sample_every=1000, num_samples=4,
        calculate_fid=False, calculate_is=False,
        results_folder=str(tmp_path / "results_single"),
        num_workers=2, augment_horizontal_flip=True,
    )
    dataset = ImageFolderDataset(
        img_folder, 16, augment_horizontal_flip=True
    )
    shard_iters = [
        iter(DataLoader(dataset, batch_size=8, num_workers=2, seed=0,
                        num_shards=2, shard_id=i))
        for i in range(2)
    ]

    def interleaved():
        while True:
            yield np.concatenate(
                [next(shard_iters[0]), next(shard_iters[1])], axis=0
            )

    trainer.dl = interleaved()
    trainer.train()

    got = np.load(tmp_path / "final_params.npz")
    want = [np.asarray(l) for l in
            jax.tree_util.tree_leaves(trainer.state.params)]
    assert len(got.files) == len(want)
    for i, (k, w) in enumerate(zip(got.files, want)):
        np.testing.assert_allclose(
            got[k], w, rtol=2e-5, atol=2e-6,
            err_msg=f"param leaf {i} diverged between 2-process and "
                    f"single-process training",
        )
