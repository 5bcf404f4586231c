"""Dataset + loader tests over a synthetic image folder."""

import pickle

import numpy as np
import pytest
from PIL import Image

from diffusion_models_tpu.utils.data import (
    DataLoader,
    ImageConditionalDataset,
    ImageFolderDataset,
    TextConditionalDataset,
)


@pytest.fixture(scope="module")
def image_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rs = np.random.RandomState(0)
    for i in range(12):
        arr = rs.randint(0, 255, (40, 40, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / f"img_{i:03d}.png")
    return root


@pytest.fixture(scope="module")
def paired_folder(tmp_path_factory):
    root = tmp_path_factory.mktemp("pairs")
    (root / "condition").mkdir()
    (root / "target").mkdir()
    rs = np.random.RandomState(1)
    for i in range(6):
        a = rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        b = rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(a).save(root / "condition" / f"{i}_A.jpg")
        Image.fromarray(b).save(root / "target" / f"{i}_B.jpg")
    return root


def test_folder_dataset(image_folder):
    ds = ImageFolderDataset(image_folder, image_size=16)
    assert len(ds) == 12
    item = ds.get(0)
    assert item.shape == (16, 16, 3)
    assert item.dtype == np.float32
    assert item.min() >= 0 and item.max() <= 1


def test_resize_short_side_center_crop(image_folder):
    # non-square source: short side resized to 16 then center-cropped
    ds = ImageFolderDataset(image_folder, image_size=16)
    from PIL import Image as PILImage

    wide = PILImage.fromarray(
        np.zeros((20, 60, 3), dtype=np.uint8)
    )
    from diffusion_models_tpu.utils.data import resize_and_center_crop

    out = resize_and_center_crop(wide, 16)
    assert out.size == (16, 16)


def test_dataloader_batches(image_folder):
    ds = ImageFolderDataset(image_folder, image_size=16)
    dl = DataLoader(ds, batch_size=4, num_workers=2, seed=0)
    it = iter(dl)
    b1 = next(it)
    b2 = next(it)
    assert b1.shape == (4, 16, 16, 3)
    assert b2.shape == (4, 16, 16, 3)
    assert not np.array_equal(b1, b2)


def test_image_conditional_dataset(paired_folder):
    ds = ImageConditionalDataset(paired_folder, image_size=16)
    assert len(ds) == 6
    target, cond = ds.get(0)
    assert target.shape == (16, 16, 3)
    assert cond.shape == (16, 16, 3)
    dl = DataLoader(ds, batch_size=2, num_workers=1, seed=0)
    t, c = next(iter(dl))
    assert t.shape == (2, 16, 16, 3) and c.shape == (2, 16, 16, 3)


def test_text_conditional_dataset(tmp_path):
    root = tmp_path / "textds"
    (root / "condition").mkdir(parents=True)
    (root / "target").mkdir()
    rs = np.random.RandomState(2)
    emb_dict = {}
    for i in range(4):
        stem = f"{i:06d}"
        arr = rs.randint(0, 255, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(root / "target" / f"{stem}.jpg")
        emb_dict[stem] = {
            "captions": [f"caption {i}a", f"caption {i}b"],
            "embeddings": rs.randn(2, 512).astype(np.float32),
        }
    with open(root / "text_embeddings.pkl", "wb") as f:
        pickle.dump(emb_dict, f)

    ds = TextConditionalDataset(root, image_size=16)
    assert len(ds) == 4
    target, emb = ds.get(0, np.random.default_rng(0))
    assert target.shape == (16, 16, 3)
    assert emb.shape == (512,)

    caps, embs = ds.random_embeddings(3, np.random.default_rng(1))
    assert len(caps) == 3 and embs.shape == (3, 512)


def test_dataloader_sharding(image_folder):
    """Shards partition each epoch's permutation disjointly."""
    ds = ImageFolderDataset(image_folder, image_size=16)
    idx_sets = []
    for shard in range(2):
        dl = DataLoader(ds, batch_size=3, num_workers=1, seed=7,
                        num_shards=2, shard_id=shard)
        gen = dl._index_stream()
        epoch = np.concatenate([next(gen), next(gen)])
        idx_sets.append(set(epoch.tolist()))
    assert idx_sets[0].isdisjoint(idx_sets[1])


def test_uint8_transport_bit_identical(tmp_path):
    """get_batch under uint8_transport returns uint8 whose on-device
    normalization (x/255 in f32) reproduces the f32 path bit-for-bit,
    including flips (flip commutes with /255)."""
    from diffusion_models_tpu.utils.data import ImageFolderDataset

    root = tmp_path / "imgs"
    root.mkdir()
    rs = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rs.randint(0, 256, (16, 16, 3), dtype=np.uint8)).save(
            root / f"{i}.png"
        )
    ds_f32 = ImageFolderDataset(root, 16, augment_horizontal_flip=True)
    ds_u8 = ImageFolderDataset(root, 16, augment_horizontal_flip=True)
    ds_u8.uint8_transport = True

    idxs = [0, 3, 5, 7]
    rngs = [np.random.default_rng((7, i)) for i in idxs]
    rngs2 = [np.random.default_rng((7, i)) for i in idxs]
    a = ds_f32.get_batch(idxs, rngs)
    b = ds_u8.get_batch(idxs, rngs2)
    assert b.dtype == np.uint8
    np.testing.assert_array_equal(a, b.astype(np.float32) / 255.0)
    # item-level get must stay normalized f32 (FID real-stats contract)
    assert ds_u8.get(0).dtype == np.float32


def test_to_uint8_image_roundtrip_exact():
    from diffusion_models_tpu.utils.data import to_uint8_image

    u = np.arange(256, dtype=np.uint8).reshape(1, 16, 16, 1)
    f = u.astype(np.float32) / 255.0
    np.testing.assert_array_equal(to_uint8_image(f), u)
