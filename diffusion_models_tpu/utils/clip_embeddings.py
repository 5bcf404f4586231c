"""CLIP text-embedding precompute (offline tool).

Reproduces the pickle schema of the reference's
`TextConditionalDataset.precompute_text_embeddings`
(`train/utils/data.py:153-192`): for every `condition/*.txt` caption file,

    {stem: {"captions": [str, ...], "embeddings": float32 (num_captions, 512)}}

The reference uses OpenAI `clip` ViT-B/32 `encode_text`. Here the encoder is
pluggable: by default we use HuggingFace `transformers` CLIP
(openai/clip-vit-base-patch32 — same weights, same 512-d projection) when its
weights are available locally; any callable `encode_fn(list[str]) ->
(N, 512) float32` can be substituted. The training-side loader only depends
on the pickle schema, so embeddings computed by the reference repo load
unchanged.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable, Optional

import numpy as np


def make_hf_clip_encoder(model_name: str = "openai/clip-vit-base-patch32"):
    """Text encoder backed by HuggingFace transformers CLIP (CPU)."""
    import torch
    from transformers import CLIPModel, CLIPTokenizer

    tokenizer = CLIPTokenizer.from_pretrained(model_name)
    model = CLIPModel.from_pretrained(model_name)
    model.eval()

    def encode(captions):
        with torch.no_grad():
            tokens = tokenizer(
                captions, padding=True, truncation=True, return_tensors="pt"
            )
            feats = model.get_text_features(**tokens)
        return feats.cpu().numpy().astype(np.float32)

    return encode


def precompute_text_embeddings(
    condition_folder,
    embedding_file,
    encode_fn: Optional[Callable] = None,
) -> dict:
    condition_folder = Path(condition_folder)
    if encode_fn is None:
        encode_fn = make_hf_clip_encoder()

    embeddings_dict = {}
    for txt_file in sorted(condition_folder.glob("*.txt")):
        with open(txt_file, "r", encoding="utf-8") as f:
            captions = [line.strip() for line in f if line.strip()]
        if not captions:
            continue
        embeddings_dict[txt_file.stem] = {
            "captions": captions,
            "embeddings": encode_fn(captions),
        }

    embedding_file = Path(embedding_file)
    embedding_file.parent.mkdir(parents=True, exist_ok=True)
    with open(embedding_file, "wb") as f:
        pickle.dump(embeddings_dict, f)
    return embeddings_dict
