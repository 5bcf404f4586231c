"""Host-side input pipeline: folder datasets + a threaded prefetching loader.

Behavioral parity with the reference dataset classes:
  - `Dataset` (folder of images)          — `denoising_diffusion.py:904-934`
    and `train/utils/data.py:17-47`
  - `ImageConditionalDataset` (cond/target pairs, `<id>_A` / `<id>_B`)
                                          — `train/utils/data.py:51-100`
  - `TextConditionalDataset` (images + precomputed CLIP-embedding pickle
    `{stem: {captions, embeddings}}`)     — `train/utils/data.py:103-218`

TPU-native design: instead of torch DataLoader worker *processes* feeding a
GPU, decoding runs in a thread pool (PIL releases the GIL for decode) into
pinned NumPy batches which the Trainer `device_put`s asynchronously with a
`NamedSharding` over the data axis — the host pipeline overlaps with the
previous device step.

Transform semantics match torchvision's
`Resize(size) → [RandomHorizontalFlip] → CenterCrop(size) → ToTensor`:
an int `size` resizes the short side then center-crops square; output is
float32 [0,1] **NHWC** (TPU conv layout), not NCHW.
"""

from __future__ import annotations

import pickle
import queue
import threading
from pathlib import Path
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from diffusion_models_tpu.utils.helpers import exists

IMG_EXTS = ("jpg", "jpeg", "png", "tiff")


def resize_and_center_crop(img: Image.Image, image_size) -> Image.Image:
    """torchvision `Resize(int)` (short side) + `CenterCrop` equivalent."""
    if isinstance(image_size, int):
        th = tw = image_size
        w, h = img.size
        short = min(w, h)
        scale = image_size / short
        img = img.resize(
            (max(1, round(w * scale)), max(1, round(h * scale))), Image.BILINEAR
        )
    else:
        th, tw = image_size
        img = img.resize((tw, th), Image.BILINEAR)
    w, h = img.size
    left = (w - tw) // 2
    top = (h - th) // 2
    return img.crop((left, top, left + tw, top + th))


def _load_transformed(
    path,
    image_size,
    rng: Optional[np.random.Generator],
    augment_horizontal_flip: bool,
    convert_image_to: Optional[str],
) -> np.ndarray:
    img = Image.open(path)
    if exists(convert_image_to) and img.mode != convert_image_to:
        img = img.convert(convert_image_to)
    elif img.mode not in ("RGB", "L"):
        img = img.convert("RGB")
    flip = (
        augment_horizontal_flip
        and rng is not None
        and rng.random() < 0.5
    )

    # fast path: PIL decodes, the native C++ library does resize/crop/flip/
    # normalize (antialiased, PIL-equivalent) without Python overhead
    if isinstance(image_size, int):
        from diffusion_models_tpu.utils import native_preproc

        if native_preproc.available():
            raw = np.asarray(img, dtype=np.uint8)
            if raw.ndim == 2:
                raw = raw[..., None]
            return native_preproc.preprocess_batch(
                [raw], image_size, [flip], num_threads=1
            )[0]

    img = resize_and_center_crop(img, image_size)
    if flip:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    arr = np.asarray(img, dtype=np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr


_CACHE_LIMIT_BYTES = 4 << 30  # auto-cache datasets up to 4 GiB decoded


def to_uint8_image(arr: np.ndarray) -> np.ndarray:
    """Exact inverse of the loaders' `/255` normalization for uint8-origin
    pixels: round-trips k/255 → k bit-perfectly. Used by the uint8-transport
    path (see `uint8_transport` below) to compress already-normalized items
    back to 1 byte/px before the host→device upload."""
    return np.rint(arr * 255.0).astype(np.uint8)


class ImageFolderDataset:
    """Recursive folder of images → float32 [0,1] HWC items.

    `uint8_transport`: when set (the trainers set it), `get_batch` returns
    image batches as uint8 0–255 instead of f32 [0,1] and the jitted train
    step divides by 255 on device — 4× less host→device transfer for
    byte-identical training (flip commutes with /255; the division is the
    same f32 op either side). Item-level `get` ALWAYS returns normalized
    f32 — the FID real-stats path and sampling-time conditioning rely on
    that contract.

    For small datasets (≤4 GiB decoded, e.g. the 32×32 flagship set) the
    whole dataset is decoded ONCE into a uint8 RAM cache and batches are
    assembled with a vectorized gather + flip — per-image PIL decode in the
    hot loop caps the TPU train step at the PNG-decode rate otherwise (the
    tf.data `cache()` equivalent). Set `cache_in_memory=False` to disable.
    """

    def __init__(
        self,
        folder,
        image_size,
        exts: Sequence[str] = IMG_EXTS,
        augment_horizontal_flip: bool = False,
        convert_image_to: Optional[str] = None,
        cache_in_memory: bool | str = "auto",
    ):
        self.folder = Path(folder)
        self.image_size = image_size
        self.paths = sorted(
            p for ext in exts for p in self.folder.glob(f"**/*.{ext}")
        )
        assert len(self.paths) > 0, f"no images found under {folder}"
        self.augment_horizontal_flip = augment_horizontal_flip
        self.convert_image_to = convert_image_to

        self.uint8_transport = False
        self._cache: Optional[np.ndarray] = None
        self._cache_lock = threading.Lock()
        if cache_in_memory == "auto":
            size_ok = (
                isinstance(image_size, int)
                and len(self.paths) * image_size * image_size * 4
                <= _CACHE_LIMIT_BYTES
            )
            self._want_cache = size_ok
        else:
            self._want_cache = bool(cache_in_memory)

    def __len__(self):
        return len(self.paths)

    def _decode_uint8(self, path) -> np.ndarray:
        """Decode + resize/crop to uint8 HWC (PIL semantics — identical to
        the float path, which also resizes in PIL before /255)."""
        img = Image.open(path)
        if exists(self.convert_image_to) and img.mode != self.convert_image_to:
            img = img.convert(self.convert_image_to)
        elif img.mode not in ("RGB", "L"):
            img = img.convert("RGB")
        img = resize_and_center_crop(img, self.image_size)
        arr = np.asarray(img, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[..., None]
        return arr

    def _ensure_cache(self) -> bool:
        if not self._want_cache:
            return False
        if self._cache is not None:
            return True
        with self._cache_lock:
            if self._cache is None:
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=16) as pool:
                    imgs = list(pool.map(self._decode_uint8, self.paths))
                if len({im.shape for im in imgs}) != 1:
                    # ragged channel counts — fall back to per-item decode
                    self._want_cache = False
                    return False
                self._cache = np.stack(imgs)
        return True

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        if self._ensure_cache():
            arr = self._cache[index].astype(np.float32) / 255.0
            if (
                self.augment_horizontal_flip
                and rng is not None
                and rng.random() < 0.5
            ):
                arr = arr[:, ::-1]
            return arr
        return _load_transformed(
            self.paths[index],
            self.image_size,
            rng,
            self.augment_horizontal_flip,
            self.convert_image_to,
        )

    def get_batch(self, idxs, rngs) -> Optional[np.ndarray]:
        """Vectorized batch assembly from the RAM cache (gather + flip +
        normalize). Returns None when the cache is unavailable (dataset too
        large / ragged / disabled) so the DataLoader falls through to its
        parallel per-item decode path instead of a serial stack."""
        if not self._ensure_cache():
            return None
        batch = self._cache[np.asarray(idxs, np.int64)]
        if not self.uint8_transport:
            batch = batch.astype(np.float32) / 255.0
        else:
            batch = batch.copy()  # cache rows must not be flipped in place
        if self.augment_horizontal_flip:
            flips = np.fromiter(
                (r.random() < 0.5 for r in rngs), dtype=bool, count=len(rngs)
            )
            batch[flips] = batch[flips, :, ::-1]
        return batch


class ImageConditionalDataset:
    """Paired condition/target folders: `condition/<id>_A.*`, `target/<id>_B.jpg`.

    Items are `(target, cond)` tuples, matching the reference ordering
    (`train/utils/data.py:100`).
    """

    def __init__(
        self,
        root,
        image_size,
        augment_horizontal_flip: bool = False,
        convert_image_to: Optional[str] = None,
    ):
        self.root = Path(root)
        self.image_size = image_size
        self.cond_paths = sorted((self.root / "condition").glob("*.*"))
        self.target_folder = self.root / "target"
        assert len(self.cond_paths) > 0, f"no condition images under {root}"
        self.augment_horizontal_flip = augment_horizontal_flip
        self.convert_image_to = convert_image_to

    def __len__(self):
        return len(self.cond_paths)

    def _target_path(self, cond_path: Path) -> Path:
        prefix = cond_path.stem.split("_")[0]
        for ext in ("jpg", "jpeg", "png"):
            cand = self.target_folder / f"{prefix}_B.{ext}"
            if cand.exists():
                return cand
        return self.target_folder / f"{prefix}_B.jpg"

    uint8_transport = False

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        cond_path = self.cond_paths[index]
        load = lambda p: _load_transformed(
            p, self.image_size, rng, self.augment_horizontal_flip, "RGB"
        )
        return load(self._target_path(cond_path)), load(cond_path)

    def get_batch(self, idxs, rngs):
        pairs = [self.get(int(i), r) for i, r in zip(idxs, rngs)]
        tgt = np.stack([p[0] for p in pairs])
        cond = np.stack([p[1] for p in pairs])
        if self.uint8_transport:
            tgt, cond = to_uint8_image(tgt), to_uint8_image(cond)
        return tgt, cond


class ClassConditionalDataset(ImageFolderDataset):
    """Images + integer class labels, for classifier-free guidance training
    (reference `classifier_free_guidance.py` takes `classes` tensors but
    ships no dataset; this supplies one from the caption-folder layout).

    Layout: `root/{target/*.png, condition/*.txt}` — the same layout the
    text-conditional pipeline uses (`train/utils/data.py` caption-folder
    convention); the class of an image is the index of its caption string in
    the sorted set of unique captions. Items are `(image, class_int32)`.
    """

    def __init__(
        self,
        root,
        image_size,
        augment_horizontal_flip: bool = False,
        convert_image_to: Optional[str] = None,
        cache_in_memory: bool | str = "auto",
    ):
        root = Path(root)
        super().__init__(
            root / "target",
            image_size,
            augment_horizontal_flip=augment_horizontal_flip,
            convert_image_to=convert_image_to,
            cache_in_memory=cache_in_memory,
        )
        captions = {}
        for p in self.paths:
            cap_path = root / "condition" / f"{p.stem}.txt"
            captions[p.stem] = cap_path.read_text().strip()
        self.class_names = sorted(set(captions.values()))
        name_to_idx = {n: i for i, n in enumerate(self.class_names)}
        self.labels = np.asarray(
            [name_to_idx[captions[p.stem]] for p in self.paths], np.int32
        )

    @property
    def num_classes(self) -> int:
        return len(self.class_names)

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        return super().get(index, rng), self.labels[index]

    def get_batch(self, idxs, rngs):
        imgs = super().get_batch(idxs, rngs)
        if imgs is None:
            return None
        return imgs, self.labels[np.asarray(idxs, np.int64)]


class TextConditionalDataset:
    """Images + precomputed text embeddings.

    Folder layout `root/{condition/*.txt, target/*.img}`; embeddings pickle
    schema `{stem: {"captions": [...], "embeddings": (num_captions, D)}}` —
    identical to the reference's precompute output
    (`train/utils/data.py:176-192`), so pickles are interchangeable between
    frameworks. Items are `(target, text_emb)`.
    """

    def __init__(
        self,
        root,
        image_size,
        augment_horizontal_flip: bool = False,
        convert_image_to: Optional[str] = None,
        embedding_file=None,
        text_emb_dim: int = 512,
    ):
        self.root = Path(root)
        self.image_size = image_size
        self.target_paths = sorted((self.root / "target").glob("*.*"))
        assert len(self.target_paths) > 0, f"no target images under {root}"
        self.augment_horizontal_flip = augment_horizontal_flip
        self.convert_image_to = convert_image_to
        self.text_emb_dim = text_emb_dim

        self.embedding_file = Path(
            embedding_file if exists(embedding_file) else self.root / "text_embeddings.pkl"
        )
        if self.embedding_file.exists():
            with open(self.embedding_file, "rb") as f:
                self.embeddings_dict = pickle.load(f)
        else:
            from diffusion_models_tpu.utils.clip_embeddings import (
                precompute_text_embeddings,
            )

            self.embeddings_dict = precompute_text_embeddings(
                self.root / "condition", self.embedding_file
            )

    def __len__(self):
        return len(self.target_paths)

    uint8_transport = False

    def get_batch(self, idxs, rngs):
        items = [self.get(int(i), r) for i, r in zip(idxs, rngs)]
        tgt = np.stack([it[0] for it in items])
        emb = np.stack([it[1] for it in items])
        if self.uint8_transport:
            tgt = to_uint8_image(tgt)
        return tgt, emb

    def get(self, index: int, rng: Optional[np.random.Generator] = None):
        path = self.target_paths[index]
        target = _load_transformed(
            path, self.image_size, rng, self.augment_horizontal_flip, "RGB"
        )
        data = self.embeddings_dict.get(path.stem)
        if data is not None:
            embs = np.asarray(data["embeddings"], dtype=np.float32)
            idx = int(rng.integers(embs.shape[0])) if rng is not None else 0
            text_emb = embs[idx]
        else:
            text_emb = np.zeros((self.text_emb_dim,), np.float32)
        return target, text_emb

    def random_embeddings(self, n: int, rng: np.random.Generator):
        """Draw n random (caption, embedding) pairs for sampling-time
        conditioning (reference `..._text_conditional.py:320-363`)."""
        stems = [s for s, d in self.embeddings_dict.items() if d is not None]
        captions, embs = [], []
        for _ in range(n):
            stem = stems[int(rng.integers(len(stems)))]
            d = self.embeddings_dict[stem]
            j = int(rng.integers(len(d["captions"])))
            captions.append(d["captions"][j])
            embs.append(np.asarray(d["embeddings"][j], dtype=np.float32))
        return captions, np.stack(embs)


class DataLoader:
    """Infinite shuffled batch iterator with threaded decode + prefetch."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 8,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_id: int = 0,
    ):
        """`num_shards`/`shard_id`: multi-host data sharding — every host
        draws the SAME seeded permutation and takes its own stride, so the
        global batch is a disjoint partition across processes (the JAX-native
        replacement for accelerate's per-rank DistributedSampler)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        assert 0 <= shard_id < num_shards
        self.num_shards = num_shards
        self.shard_id = shard_id

    def _index_stream(self):
        rng = np.random.default_rng(self.seed)
        n = len(self.dataset)
        while True:
            order = rng.permutation(n) if self.shuffle else np.arange(n)
            if self.num_shards > 1:
                order = order[self.shard_id :: self.num_shards]
            limit = len(order) - (self.batch_size - 1 if self.drop_last else 0)
            for i in range(0, limit, self.batch_size):
                yield order[i : i + self.batch_size]

    @staticmethod
    def _collate(items):
        first = items[0]
        if isinstance(first, tuple):
            return tuple(
                np.stack([it[j] for it in items]) for j in range(len(first))
            )
        return np.stack(items)

    def __iter__(self):
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=self.num_workers)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def load_batch(idxs, epoch_seed):
            rngs = [
                np.random.default_rng((epoch_seed, int(i))) for i in idxs
            ]
            if hasattr(self.dataset, "get_batch"):
                batch = self.dataset.get_batch(idxs, rngs)
                if batch is not None:
                    return batch
            items = list(
                pool.map(lambda a: self.dataset.get(int(a[0]), a[1]), zip(idxs, rngs))
            )
            return self._collate(items)

        def producer():
            for step, idxs in enumerate(self._index_stream()):
                if stop.is_set():
                    return
                q.put(load_batch(idxs, self.seed + step))

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        try:
            while True:
                yield q.get()
        finally:
            stop.set()
            pool.shutdown(wait=False)
