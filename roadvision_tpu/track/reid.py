"""Learned appearance embedder for re-identification tracking.

Beyond-reference tracking support (the reference's SORT is motion-only,
src/track/sort_tracker.py). track/appearance.py provides a handcrafted
grid descriptor; this module is the LEARNED drop-in it reserved the
interface for: a tiny convolutional metric-learning network mapping each
detection crop to the same fixed-width L2-normalized vector
(appearance.EMB_DIM), trained with a batch-hard triplet objective — the
DeepSORT recipe (Wojke et al.), sized for the "runs per frame next to
the detector" budget rather than for a dedicated re-id GPU.

TPU-first design:

  * crops come from the shared fixed-shape bilinear sampler
    (appearance.sample_box_grid) — D = max_det crops per frame, one
    batched gather set, no dynamic shapes;
  * the network is three stride-2 3x3 convs (SiLU) + global average
    pool + a linear projection: every FLOP is a conv the MXU tiles;
    D <= 100 crops of 32x32 is ~25 MFLOP/frame, noise next to YOLO;
  * training is a single jitted optax.adam step over a P-identity x
    K-view batch; the synthetic identity generator below makes the
    trainer self-contained (no dataset or network access needed), and
    `train_reid(crops_fn=...)` accepts a real crop source.

Config surface: ``tracking.reid_weights: path.npz`` — the engine then
computes descriptors with this network instead of the grid descriptor
for the re-id backends (deepsort/botsort); everything downstream
(cosine association, EMA appearance memory) is unchanged because the
vector contract is identical.
"""
from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .appearance import EMB_DIM, sample_box_grid

REID_CROP = 32                  # input crop side; 3 stride-2 convs → 4×4
_CHANNELS = (16, 32, 64)

ReidParams = Dict[str, jnp.ndarray]


# --------------------------------------------------------------------------
# network
# --------------------------------------------------------------------------

def init_reid_params(seed: int = 0) -> ReidParams:
    """He-initialized parameters (~29k floats)."""
    rng = np.random.default_rng(seed)
    p: ReidParams = {}
    cin = 3
    for i, cout in enumerate(_CHANNELS, 1):
        w = rng.normal(0.0, (2.0 / (9 * cin)) ** 0.5, (3, 3, cin, cout))
        p[f"w{i}"] = jnp.asarray(w, jnp.float32)
        p[f"b{i}"] = jnp.zeros((cout,), jnp.float32)
        cin = cout
    wd = rng.normal(0.0, (1.0 / cin) ** 0.5, (cin, EMB_DIM))
    p["wd"] = jnp.asarray(wd, jnp.float32)
    p["bd"] = jnp.zeros((EMB_DIM,), jnp.float32)
    return p


def forward_crops(params: ReidParams, crops: jnp.ndarray) -> jnp.ndarray:
    """(N, S, S, 3) f32 in [0, 255] → (N, EMB_DIM) L2-normalized."""
    x = crops * (2.0 / 255.0) - 1.0
    for i in range(1, len(_CHANNELS) + 1):
        x = jax.lax.conv_general_dilated(
            x, params[f"w{i}"], window_strides=(2, 2), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + params[f"b{i}"]
        x = jax.nn.silu(x)
    x = jnp.mean(x, axis=(1, 2))                 # global average pool
    x = x @ params["wd"] + params["bd"]
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(n, 1e-6)


def reid_embeddings(params: ReidParams, frame_u8: jnp.ndarray,
                    boxes: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Same contract as appearance.box_embeddings, with learned weights:
    (H, W, 3) u8 + (D, 4) xyxy + (D,) bool → (D, EMB_DIM) f32, zero rows
    for invalid detections."""
    crops = sample_box_grid(frame_u8, boxes, REID_CROP)
    emb = forward_crops(params, crops)
    return jnp.where(valid[:, None], emb, 0.0)


def make_reid_embed(params: ReidParams):
    """Bind params → an engine-pluggable ``embed(frame, boxes, valid)``."""
    def embed(frame_u8, boxes, valid):
        return reid_embeddings(params, frame_u8, boxes, valid)
    return embed


def save_reid_params(path, params: ReidParams) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_reid_params(path) -> ReidParams:
    with np.load(path) as z:
        params = {k: jnp.asarray(z[k]) for k in z.files}
    missing = {f"w{i}" for i in range(1, len(_CHANNELS) + 1)} \
        | {f"b{i}" for i in range(1, len(_CHANNELS) + 1)} | {"wd", "bd"}
    missing -= set(params)
    if missing:
        # biases included: a half-valid file must fail HERE, inside the
        # engine's soft-fail construction guard, not as a KeyError in
        # the first streamed frame's trace
        raise ValueError(f"re-id weights {path}: missing arrays "
                         f"{sorted(missing)}")
    for i in range(1, len(_CHANNELS) + 1):
        if params[f"w{i}"].ndim != 4 or params[f"b{i}"].ndim != 1 \
                or params[f"w{i}"].shape[-1] != params[f"b{i}"].shape[0]:
            raise ValueError(
                f"re-id weights {path}: w{i}/b{i} shapes "
                f"{params[f'w{i}'].shape}/{params[f'b{i}'].shape} are not "
                f"a conv kernel + matching bias")
    if params["wd"].shape[-1] != EMB_DIM:
        raise ValueError(
            f"re-id weights {path}: output width "
            f"{params['wd'].shape[-1]} != EMB_DIM {EMB_DIM}")
    return params


# --------------------------------------------------------------------------
# synthetic identity generator (self-contained trainer data)
# --------------------------------------------------------------------------

def _identity_style(ident: int):
    """Deterministic per-identity look: two colors + stripe geometry."""
    rng = np.random.default_rng(0x5EED ^ (int(ident) * 2654435761 % 2**31))
    c1 = rng.integers(30, 226, 3).astype(np.float32)
    c2 = rng.integers(30, 226, 3).astype(np.float32)
    period = int(rng.integers(6, 16))
    horiz = bool(rng.integers(0, 2))
    phase = float(rng.uniform(0, period))
    return c1, c2, period, horiz, phase


def render_identity_view(ident: int, rng: np.random.Generator,
                         frame: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """One augmented view of an identity placed in a noise frame.

    Returns (frame_u8 (F, F, 3), box (1, 4) xyxy). Augmentations cover
    what a tracked road object actually varies by between frames:
    position, scale, brightness, sensor noise, slight stripe shift.
    """
    img = rng.integers(0, 60, (frame, frame, 3)).astype(np.float32)
    side_w = int(rng.integers(18, min(44, frame - 4)))
    side_h = int(rng.integers(18, min(44, frame - 4)))
    x1 = int(rng.integers(1, frame - side_w - 1))
    y1 = int(rng.integers(1, frame - side_h - 1))
    c1, c2, period, horiz, phase = _identity_style(ident)
    yy, xx = np.mgrid[0:side_h, 0:side_w]
    # stripes in BOX-NORMALIZED coordinates so scale changes do not
    # change the pattern the sampler sees (the invariance we train for)
    coord = (yy / side_h if horiz else xx / side_w) * REID_CROP
    m = ((coord + phase + rng.uniform(-0.5, 0.5)) % period) < (period / 2)
    patch = np.where(m[..., None], c1, c2)
    gain = rng.uniform(0.65, 1.35)
    patch = patch * gain + rng.normal(0, 6.0, patch.shape)
    img[y1:y1 + side_h, x1:x1 + side_w] = patch
    img = np.clip(img, 0, 255).astype(np.uint8)
    box = np.array([[x1, y1, x1 + side_w, y1 + side_h]], np.float32)
    return img, box


def synthetic_reid_batch(rng: np.random.Generator, idents: np.ndarray,
                         views: int, frame: int = 64):
    """P identities × K views → (frames (N,F,F,3) u8, boxes (N,1,4),
    labels (N,) int32), N = P·K."""
    frames, boxes, labels = [], [], []
    for ident in idents:
        for _ in range(views):
            img, box = render_identity_view(int(ident), rng, frame)
            frames.append(img)
            boxes.append(box)
            labels.append(int(ident))
    return (np.stack(frames), np.stack(boxes),
            np.asarray(labels, np.int32))


# --------------------------------------------------------------------------
# training
# --------------------------------------------------------------------------

def batch_hard_triplet(emb: jnp.ndarray, labels: jnp.ndarray,
                       margin: float = 0.3) -> jnp.ndarray:
    """Batch-hard triplet loss on cosine distance (Hermans et al.):
    per anchor, hardest positive minus easiest-confused negative."""
    d = 1.0 - emb @ emb.T                       # cosine distance
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    hardest_pos = jnp.where(same & ~eye, d, -jnp.inf).max(axis=1)
    hardest_neg = jnp.where(~same, d, jnp.inf).min(axis=1)
    return jnp.maximum(hardest_pos - hardest_neg + margin, 0.0).mean()


def embed_frames(params: ReidParams, frames_u8, boxes) -> jnp.ndarray:
    """(N, F, F, 3) u8 + (N, 1, 4) → (N, EMB_DIM): per-frame single-box
    embedding (the training view of reid_embeddings)."""
    valid = jnp.ones((boxes.shape[0], 1), bool)
    emb = jax.vmap(reid_embeddings, in_axes=(None, 0, 0, 0))(
        params, frames_u8, boxes, valid)
    return emb[:, 0]


def train_reid(steps: int = 300, idents: int = 8, views: int = 4,
               ident_pool: int = 128, lr: float = 1e-3, margin: float = 0.3,
               seed: int = 0, frame: int = 64,
               batch_fn: Optional[Callable] = None,
               log_every: int = 0,
               log: Optional[Callable[[str], None]] = None
               ) -> Tuple[ReidParams, List[float]]:
    """Train the embedder on synthetic identities (or ``batch_fn() →
    (frames, boxes, labels)``). Returns (params, loss history)."""
    import optax

    params = init_reid_params(seed)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    rng = np.random.default_rng(seed)

    @jax.jit
    def step(params, opt_state, frames, boxes, labels):
        def loss_fn(p):
            return batch_hard_triplet(embed_frames(p, frames, boxes),
                                      labels, margin)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    history: List[float] = []
    for i in range(steps):
        if batch_fn is not None:
            frames, boxes, labels = batch_fn()
        else:
            picked = rng.choice(ident_pool, size=idents, replace=False)
            frames, boxes, labels = synthetic_reid_batch(
                rng, picked, views, frame)
        params, opt_state, loss = step(params, opt_state,
                                       jnp.asarray(frames),
                                       jnp.asarray(boxes),
                                       jnp.asarray(labels))
        history.append(float(loss))
        if log_every and log and (i + 1) % log_every == 0:
            log(f"step {i + 1}/{steps}  triplet {history[-1]:.4f}")
    return params, history


def identity_separation(params: ReidParams, idents: np.ndarray,
                        views: int = 4, seed: int = 10_000,
                        frame: int = 64) -> float:
    """Evaluation scalar: mean same-identity cosine minus mean
    cross-identity cosine over fresh views (higher = better re-id)."""
    rng = np.random.default_rng(seed)
    frames, boxes, labels = synthetic_reid_batch(rng, idents, views, frame)
    emb = np.asarray(embed_frames(params, jnp.asarray(frames),
                                  jnp.asarray(boxes)))
    cos = emb @ emb.T
    same = labels[:, None] == labels[None, :]
    eye = np.eye(len(labels), dtype=bool)
    return float(cos[same & ~eye].mean() - cos[~same].mean())
