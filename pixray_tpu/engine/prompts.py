"""Prompt embedding tables + the vectorized spherical prompt loss.

Reference semantics (/root/reference/pixray.py:268-321, 751-958): every prompt
(text / target-image / vector / label / noise) reduces at init time to a row in a
per-perceptor embedding table with a weight and a stop threshold; at step time the
loss for embedding batch ``iii`` against each row is

    dist = spherical_dist(iii, embed) * sign(weight)
    loss = |weight| * mean(replace_grad(dist, max(dist, stop)))

(the ReplaceGrad trick stops gradients once a prompt is "satisfied" past its stop
threshold while keeping its forward value in the reported loss).

TPU design: the reference loops Python ``Prompt`` modules; here each table is one
(P, D) array + (P,) weights/stops and the loss over all prompts is a single
batched einsum-style computation.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from pixray_tpu.ops.grad import l2_normalize, replace_grad
from pixray_tpu.prompt import parse_prompt

IMAGENET_TEMPLATES = [
    "itap of a {}.",
    "a bad photo of the {}.",
    "a origami {}.",
    "a photo of the large {}.",
    "a {} in a video game.",
    "art of the {}.",
    "a photo of the small {}.",
]


@dataclass
class PromptTable:
    """Stacked prompt embeddings for one perceptor. Arrays are device-ready."""

    embeds: jnp.ndarray  # (P, D)
    weights: jnp.ndarray  # (P,)
    stops: jnp.ndarray  # (P,)

    @classmethod
    def empty(cls, dim: int):
        return cls(
            embeds=jnp.zeros((0, dim), jnp.float32),
            weights=jnp.zeros((0,), jnp.float32),
            stops=jnp.zeros((0,), jnp.float32),
        )

    @classmethod
    def from_rows(cls, rows):
        """rows: list of (embed (D,) or (K, D), weight, stop)."""
        embeds, weights, stops = [], [], []
        for embed, weight, stop in rows:
            e = np.atleast_2d(np.asarray(embed, dtype=np.float32))
            for row in e:
                embeds.append(row)
                weights.append(weight)
                stops.append(stop)
        return cls(
            embeds=jnp.asarray(np.stack(embeds)),
            weights=jnp.asarray(np.asarray(weights, np.float32)),
            stops=jnp.asarray(np.asarray(stops, np.float32)),
        )

    @property
    def size(self) -> int:
        return int(self.embeds.shape[0])


def prompt_losses(iii, table: PromptTable):
    """Per-prompt losses of an embedding batch against a table.

    iii: (N, D) L2-normalized image embeddings.
    Returns (P,) per-prompt loss values (empty table → shape (0,)).
    """
    if table.size == 0:
        return jnp.zeros((0,), jnp.float32)
    emb = l2_normalize(table.embeds, axis=-1)  # (P, D)
    x = l2_normalize(iii, axis=-1)  # (N, D)
    # chord length via cosine: ||x - e||^2 = 2 - 2 x·e   (both unit)
    cos = jnp.clip(x @ emb.T, -1.0, 1.0)  # (N, P)
    chord = jnp.sqrt(jnp.maximum(2.0 - 2.0 * cos, 1e-12))
    dists = jnp.square(jnp.arcsin(chord / 2.0)) * 2.0  # (N, P)
    dists = dists * jnp.sign(table.weights)[None, :]
    clamped = replace_grad(dists, jnp.maximum(dists, table.stops[None, :]))
    return jnp.abs(table.weights) * jnp.mean(clamped, axis=0)


def single_prompt_loss(iii, embed, weight=1.0):
    """Transient image-prompt loss (reference pixray.py:1319-1336)."""
    x = l2_normalize(iii, axis=-1)
    e = l2_normalize(embed, axis=-1)
    cos = jnp.clip(x @ e.T, -1.0, 1.0)
    chord = jnp.sqrt(jnp.maximum(2.0 - 2.0 * cos, 1e-12))
    dists = jnp.square(jnp.arcsin(chord / 2.0)) * 2.0
    return jnp.abs(weight) * jnp.mean(dists * jnp.sign(weight))


def find_vector_file(name: str):
    """Locate a vector-prompt JSON (reference pixray.py:887-905)."""
    if "json" in name:
        return name if os.path.exists(name) else None
    pkg_dir = os.path.dirname(os.path.dirname(__file__))
    for base in (os.environ.get("PIXRAY_TPU_VECTORS", ""), "vectors",
                 os.path.join(pkg_dir, "vectors"),
                 os.path.join(os.path.dirname(pkg_dir), "vectors")):
        if not base:
            continue
        path = os.path.join(base, f"{name}.json")
        if os.path.exists(path):
            return path
    return None


def build_prompt_tables(args, perceptors, drawer=None, target_image_paths=None):
    """Construct the per-perceptor prompt tables from resolved settings.

    Returns (tables, spot_tables, spot_off_tables, target_tables, clip_embed)
    where each is {perceptor_name: PromptTable} and ``clip_embed`` is the weighted
    prompt embedding used by cc12m-conditioned diffusion drawers
    (pixray.py:879-885), or None.
    """
    rows = {p.name: [] for p in perceptors}
    spot_rows = {p.name: [] for p in perceptors}
    spot_off_rows = {p.name: [] for p in perceptors}
    target_rows = {p.name: [] for p in perceptors}

    drawer_clip_target = getattr(drawer, "clip_model", None) if drawer is not None else None
    all_prompt_embeds: list = []
    all_weights: list = []

    # --- target image prompts (one-shot encoded)
    if target_image_paths:
        for p in perceptors:
            for path, weight, stop in target_image_paths:
                from pixray_tpu.io.images import load_image_for_perceptor

                img = load_image_for_perceptor(path, p.input_resolution)
                feats = np.asarray(p.encode_image(img[None], apply_preprocess=True))
                if args.animation_dir is not None:
                    target_rows[p.name].append((feats, weight, stop))
                else:
                    rows[p.name].append((feats, weight, stop))
                    if p.name == drawer_clip_target:
                        all_prompt_embeds.append(feats)
                        all_weights.append(weight)

    # --- text prompts ('=' prefix selects stop-pooled encoding, pixray.py:864-870)
    for prompt in args.prompts or []:
        txt, weight, stop = parse_prompt(prompt)
        use_stops = txt.startswith("=")
        if use_stops:
            txt = txt[1:]
        for p in perceptors:
            if use_stops:
                embed = np.asarray(p.encode_text_with_stops(txt))
            else:
                embed = np.asarray(p.encode_text(txt))
            rows[p.name].append((embed, weight, stop))
            if p.name == drawer_clip_target:
                all_prompt_embeds.append(embed)
                all_weights.append(weight)

    # --- vector prompts (weights scaled 0.1x, pixray.py:889-890)
    for vect_prompt in args.vector_prompts or []:
        name, weight, stop = parse_prompt(vect_prompt)
        weight = 0.1 * weight
        path = find_vector_file(name)
        if path is None:
            print(f"WARNING: vector prompt file for {name!r} not found, skipping")
            continue
        with open(path) as f:
            vect_table = json.load(f)
        for p in perceptors:
            if p.name not in vect_table:
                print(f"WARNING: no vector for {p.name} in {name}! Continuing without it.")
                continue
            rows[p.name].append((np.asarray(vect_table[p.name], np.float32), weight, stop))

    # --- spot prompts
    for prompt in args.spot_prompts or []:
        txt, weight, stop = parse_prompt(prompt)
        for p in perceptors:
            spot_rows[p.name].append((np.asarray(p.encode_text(txt)), weight, stop))
    for prompt in args.spot_prompts_off or []:
        txt, weight, stop = parse_prompt(prompt)
        for p in perceptors:
            spot_off_rows[p.name].append((np.asarray(p.encode_text(txt)), weight, stop))

    # --- ImageNet-template label prompts (pixray.py:933-945)
    for label in args.labels or []:
        txt, weight, stop = parse_prompt(label)
        texts = [template.format(txt) for template in IMAGENET_TEMPLATES]
        for p in perceptors:
            embeds = np.asarray(p.encode_text(texts))
            embeds = embeds / np.linalg.norm(embeds, axis=-1, keepdims=True)
            mean_embed = embeds.mean(axis=0)
            mean_embed = mean_embed / np.linalg.norm(mean_embed)
            rows[p.name].append((mean_embed, weight, stop))

    # --- noise prompts (pixray.py:955-958; applies to the LAST perceptor, as in
    # the reference where the loop variable leaks)
    if args.noise_prompt_seeds:
        last = perceptors[-1]
        for seed, weight in zip(args.noise_prompt_seeds, args.noise_prompt_weights):
            rng = np.random.default_rng(seed)
            embed = rng.standard_normal((1, last.output_dim)).astype(np.float32)
            rows[last.name].append((embed, weight, float("-inf")))

    def mktable(rdict, p):
        return (
            PromptTable.from_rows(rdict[p.name])
            if rdict[p.name]
            else PromptTable.empty(p.output_dim)
        )

    tables = {p.name: mktable(rows, p) for p in perceptors}
    spot_tables = {p.name: mktable(spot_rows, p) for p in perceptors}
    spot_off_tables = {p.name: mktable(spot_off_rows, p) for p in perceptors}
    target_tables = {p.name: mktable(target_rows, p) for p in perceptors}

    clip_embed = None
    if drawer_clip_target is not None and all_prompt_embeds:
        embeds = np.concatenate([np.atleast_2d(e) for e in all_prompt_embeds], axis=0)
        weights = np.asarray(all_weights, np.float32)[:, None]
        summed = (embeds * weights).sum(axis=0, keepdims=True)
        clip_embed = summed / np.linalg.norm(summed, axis=-1, keepdims=True)

    return tables, spot_tables, spot_off_tables, target_tables, clip_embed
