"""Depth-supervised NeRF (the legacy `tactile-nerf` model family).

Rebuild of ``legacy/model_tactile.py`` + ``legacy/config_tactile.py``: a
nerfacto-class model — multiresolution hash-grid encoding, fused MLP heads,
stratified + importance sampling, volume rendering — with the depth losses of
the tactile config:

- ``DS_NERF`` depth loss: the depth-supervised NeRF log-likelihood that ray
  termination lands within σ of the sensor depth
  (legacy/model_tactile.py:113-126 wiring; σ exponential decay with floor per
  :249-256)
- ``URF`` (Urban Radiance Fields) loss: expected-depth L2 plus a line-of-sight
  free-space/near-surface term
- σ decay: ``σ ← max(decay·σ, σ_min)`` each step when enabled

Everything is jnp/flax with static shapes: fixed ray batches, fixed sample
counts per ray — one jitted train step, MXU-heavy MLP evaluation.
"""
from __future__ import annotations

import dataclasses
import enum
from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from touchgs_tpu.data.cameras import Camera


class NerfDepthLossType(enum.Enum):
    DS_NERF = "DS_NERF"
    URF = "URF"


@dataclasses.dataclass(frozen=True)
class NerfConfig:
    """Mirrors TactileNerfConfig (legacy/model_tactile.py:38-56) + trainer
    budget (legacy/config_tactile.py:26-35: 30k iters, 4096 rays/batch)."""

    num_levels: int = 8
    hash_size: int = 2**15
    features_per_level: int = 2
    base_res: int = 16
    max_res: int = 512
    mlp_width: int = 64
    num_coarse: int = 48
    num_fine: int = 48
    near: float = 0.05
    far: float = 6.0
    rays_per_batch: int = 4096
    depth_loss_mult: float = 1e-3
    depth_sigma: float = 0.01
    should_decay_sigma: bool = False
    starting_depth_sigma: float = 0.2
    sigma_decay_rate: float = 0.99985
    depth_loss_type: NerfDepthLossType = NerfDepthLossType.DS_NERF
    is_euclidean_depth: bool = False
    distortion_loss_mult: float = 0.002
    lr: float = 1e-2


class HashGridMLP(nn.Module):
    """Hash-grid encoding + density/color MLPs (instant-ngp style)."""

    cfg: NerfConfig

    @nn.compact
    def __call__(self, x, d):
        """x: (R, S, 3) positions in [-1, 1]; d: (R, 3) unit view dirs.
        Returns (density (R, S), rgb (R, S, 3))."""
        c = self.cfg
        R, S, _ = x.shape
        xs = (x.reshape(-1, 3) + 1.0) * 0.5  # [0, 1]
        growth = (c.max_res / c.base_res) ** (1 / max(c.num_levels - 1, 1))
        feats = []
        primes = jnp.array([1, 2654435761, 805459861], jnp.uint32)
        for lvl in range(c.num_levels):
            res = int(c.base_res * growth**lvl)
            table = self.param(
                f"hash_{lvl}", nn.initializers.uniform(1e-4),
                (c.hash_size, c.features_per_level),
            )
            pos = xs * res
            p0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - p0
            acc = 0.0
            for corner in range(8):
                off = jnp.array([(corner >> k) & 1 for k in range(3)],
                                jnp.int32)
                cpos = (p0 + off).astype(jnp.uint32)
                h = (cpos * primes[None, :]).sum(-1) % c.hash_size
                w = jnp.prod(
                    jnp.where(off[None, :] == 1, frac, 1.0 - frac), axis=-1
                )
                acc = acc + w[:, None] * table[h.astype(jnp.int32)]
            feats.append(acc)
        enc = jnp.concatenate(feats, axis=-1)

        h = nn.Dense(c.mlp_width)(enc)
        h = nn.relu(h)
        h = nn.Dense(c.mlp_width)(h)
        h = nn.relu(h)
        density = jax.nn.softplus(nn.Dense(1)(h)[..., 0] - 1.0)
        geo_feat = nn.Dense(15)(h)

        # direction encoding: degree-4 SH-ish polynomial of the direction
        dirs = jnp.repeat(d[:, None, :], S, axis=1).reshape(-1, 3)
        denc = jnp.concatenate(
            [dirs, dirs**2, dirs[:, :1] * dirs[:, 1:2],
             dirs[:, 1:2] * dirs[:, 2:3], dirs[:, :1] * dirs[:, 2:3]],
            axis=-1,
        )
        hc = nn.Dense(c.mlp_width)(jnp.concatenate([geo_feat, denc], -1))
        hc = nn.relu(hc)
        rgb = jax.nn.sigmoid(nn.Dense(3)(hc))
        return density.reshape(R, S), rgb.reshape(R, S, 3)


class NerfRender(NamedTuple):
    rgb: jnp.ndarray      # (R, 3)
    depth: jnp.ndarray    # (R,)
    acc: jnp.ndarray      # (R,)
    weights: jnp.ndarray  # (R, S)
    ts: jnp.ndarray       # (R, S) sample midpoints


def volume_render(density, rgb, ts, dirs_norm):
    """Quadrature volume rendering (R, S) → NerfRender."""
    deltas = jnp.diff(ts, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], 1e10)], axis=-1
    )
    alpha = 1.0 - jnp.exp(-density * deltas * dirs_norm[:, None])
    log1m = jnp.log1p(-jnp.clip(alpha, 0.0, 0.999999))
    T = jnp.exp(jnp.cumsum(log1m, axis=-1) - log1m)
    w = T * alpha
    out_rgb = jnp.sum(w[..., None] * rgb, axis=1)
    acc = jnp.sum(w, axis=1)
    depth = jnp.sum(w * ts, axis=1) / jnp.maximum(acc, 1e-10)
    return NerfRender(rgb=out_rgb, depth=depth, acc=acc, weights=w, ts=ts)


def sample_rays(camera: Camera, pixels: jnp.ndarray):
    """(R, 2) integer pixel coords → (origins, dirs (unit), dirs_norm).

    dirs_norm scales z-depth ↔ euclidean distance
    (`directions_norm`, legacy/model_tactile.py:79-80)."""
    u = pixels[:, 0] + 0.5
    v = pixels[:, 1] + 0.5
    dir_cam = jnp.stack(
        [(u - camera.cx) / camera.fx, (v - camera.cy) / camera.fy,
         jnp.ones_like(u)], axis=-1,
    )
    R_cv = camera.c2w[:3, :3] @ jnp.diag(jnp.array([1.0, -1.0, -1.0]))
    dirs = dir_cam @ R_cv.T
    norm = jnp.linalg.norm(dirs, axis=-1)
    origins = jnp.broadcast_to(camera.c2w[:3, 3], dirs.shape)
    return origins, dirs / norm[:, None], norm


def render_rays(model, params, origins, dirs, cfg: NerfConfig, key,
                stratified: bool = True):
    """Coarse stratified + fine importance sampling, one model (nerfacto
    uses proposal nets; a single field sampled twice keeps the same
    render/loss contract with fewer moving parts)."""
    R = origins.shape[0]
    tbins = jnp.linspace(cfg.near, cfg.far, cfg.num_coarse + 1)
    lo = jnp.broadcast_to(tbins[:-1], (R, cfg.num_coarse))
    hi = jnp.broadcast_to(tbins[1:], (R, cfg.num_coarse))
    if stratified:
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, (R, cfg.num_coarse))
    else:
        u = 0.5
    ts = lo + (hi - lo) * u
    pts = origins[:, None, :] + ts[..., None] * dirs[:, None, :]
    density, rgb = model.apply(params, pts, dirs)
    coarse = volume_render(density, rgb, ts, jnp.ones((R,)))

    # importance-resample around mass
    w = coarse.weights + 1e-5
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[:, -1:]
    key, sub = jax.random.split(key)
    u2 = jax.random.uniform(sub, (R, cfg.num_fine))
    idx = jnp.clip(
        jnp.searchsorted(cdf[0], u2[0])[None, :] * 0
        + jax.vmap(jnp.searchsorted)(cdf, u2),
        0, cfg.num_coarse - 1,
    )
    t_fine = jnp.take_along_axis(ts, idx, axis=-1)
    all_ts = jnp.sort(jnp.concatenate([ts, t_fine], axis=-1), axis=-1)
    pts = origins[:, None, :] + all_ts[..., None] * dirs[:, None, :]
    density, rgb = model.apply(params, pts, dirs)
    return volume_render(density, rgb, all_ts, jnp.ones((R,)))


# --- depth losses (nerfstudio model_components.losses contracts) ------------

def ds_nerf_depth_loss(weights, ts, termination_depth, sigma):
    """Depth-supervised NeRF loss: −log of a Gaussian ray-termination
    likelihood, masked to rays with valid depth."""
    valid = termination_depth > 0
    td = termination_depth[:, None]
    loss = -jnp.log(sigma * jnp.sqrt(2 * jnp.pi) + 1e-12) \
        - 0.5 * ((ts - td) / sigma) ** 2
    per_ray = -jnp.sum(weights * loss, axis=-1)
    per_ray = jnp.where(valid, per_ray, 0.0)
    return jnp.sum(per_ray) / jnp.maximum(jnp.sum(valid), 1)


def urf_depth_loss(render: NerfRender, termination_depth, sigma):
    """Urban Radiance Fields: expected-depth L2 + line-of-sight terms."""
    valid = termination_depth > 0
    expected = (render.depth - termination_depth) ** 2
    td = termination_depth[:, None]
    empty = (render.ts < td - sigma).astype(jnp.float32)
    near = jnp.exp(-0.5 * ((render.ts - td) / sigma) ** 2)
    near = near / jnp.maximum(jnp.sum(near, axis=-1, keepdims=True), 1e-6)
    sight = jnp.sum(empty * render.weights**2, axis=-1) \
        + jnp.sum((render.weights - near) ** 2 * (1 - empty), axis=-1)
    per_ray = expected + 0.1 * sight
    per_ray = jnp.where(valid, per_ray, 0.0)
    return jnp.sum(per_ray) / jnp.maximum(jnp.sum(valid), 1)


def distortion_loss(weights, ts):
    """Mip-NeRF 360 distortion regularizer (efficient O(S) form)."""
    mid = ts
    wm = weights * mid
    # Σ_ij w_i w_j |m_i − m_j| over sorted samples = 2 Σ_i w_i (m_i·W_{<i} −
    # (wm)_{<i}); inclusive cumsums are fine — the self term cancels
    loss_bi = 2 * (
        wm * jnp.cumsum(weights, axis=-1) - weights * jnp.cumsum(wm, axis=-1)
    )
    deltas = jnp.diff(ts, axis=-1, append=ts[:, -1:] + 1e-3)
    loss_uni = weights**2 * deltas / 3.0
    return jnp.mean(jnp.sum(loss_bi + loss_uni, axis=-1))


class NerfTrainer:
    """Ray-batch trainer for the tactile NeRF (legacy config budget)."""

    def __init__(self, scene, cfg: NerfConfig, seed: int = 0):
        import optax

        self.scene = scene
        self.cfg = cfg
        self.model = HashGridMLP(cfg)
        key = jax.random.PRNGKey(seed)
        dummy_x = jnp.zeros((2, 4, 3))
        dummy_d = jnp.ones((2, 3))
        self.params = self.model.init(key, dummy_x, dummy_d)
        self.opt = optax.adam(cfg.lr)
        self.opt_state = self.opt.init(self.params)
        self.key = key
        self.sigma = jnp.float32(
            cfg.starting_depth_sigma if cfg.should_decay_sigma
            else cfg.depth_sigma
        )
        self._step = self._build_step()
        self.rng = np.random.default_rng(seed)

    def _build_step(self):
        cfg = self.cfg
        model = self.model
        opt = self.opt

        def loss_fn(params, camera, pixels, target_rgb, target_depth, sigma,
                    key):
            origins, dirs, dirs_norm = sample_rays(camera, pixels)
            out = render_rays(model, params, origins, dirs, cfg, key)
            rgb_loss = jnp.mean((out.rgb - target_rgb) ** 2)
            term = target_depth if cfg.is_euclidean_depth \
                else target_depth * dirs_norm
            if cfg.depth_loss_type is NerfDepthLossType.DS_NERF:
                d_loss = ds_nerf_depth_loss(out.weights, out.ts, term, sigma)
            else:
                d_loss = urf_depth_loss(out, term, sigma)
            dist = distortion_loss(out.weights, out.ts)
            total = rgb_loss + cfg.depth_loss_mult * d_loss \
                + cfg.distortion_loss_mult * dist
            psnr = -10.0 * jnp.log10(jnp.maximum(rgb_loss, 1e-10))
            return total, {"rgb_loss": rgb_loss, "depth_loss": d_loss,
                           "distortion": dist, "psnr": psnr}

        def step(params, opt_state, camera, pixels, rgb, depth, sigma, key):
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, camera, pixels, rgb, depth, sigma, key)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            metrics["loss"] = loss
            return params, opt_state, metrics

        return jax.jit(step, donate_argnums=(0, 1))

    def decay_sigma(self):
        if self.cfg.should_decay_sigma:
            self.sigma = jnp.maximum(
                self.cfg.sigma_decay_rate * self.sigma,
                jnp.float32(self.cfg.depth_sigma),
            )  # legacy/model_tactile.py:249-256

    def run(self, max_steps: int, log_every: int = 50, log_fn=None) -> dict:
        s = self.scene
        h, w = s.images.shape[1:3]
        last = {}
        for i in range(max_steps):
            view = int(self.rng.choice(s.i_train))
            px = self.rng.integers(0, w, self.cfg.rays_per_batch)
            py = self.rng.integers(0, h, self.cfg.rays_per_batch)
            pixels = jnp.asarray(np.stack([px, py], -1), jnp.float32)
            rgb = jnp.asarray(s.images[view][py, px])
            depth = (
                jnp.asarray(s.depths[view][py, px])
                if s.depths is not None
                else jnp.zeros((self.cfg.rays_per_batch,))
            )
            self.key, sub = jax.random.split(self.key)
            self.params, self.opt_state, metrics = self._step(
                self.params, self.opt_state, s.cameras.at(view), pixels, rgb,
                depth, self.sigma, sub,
            )
            self.decay_sigma()
            if i % log_every == 0 or i == max_steps - 1:
                last = {k: float(v) for k, v in metrics.items()}
                last["step"] = i
                if log_fn:
                    log_fn(last)
        return last

    def render_view(self, view: int, chunk: int = 8192):
        s = self.scene
        cam = s.cameras.at(view)
        h, w = cam.height, cam.width
        ys, xs = np.mgrid[0:h, 0:w]
        pixels = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
        outs = []
        for i in range(0, len(pixels), chunk):
            batch = jnp.asarray(pixels[i:i + chunk])
            origins, dirs, _ = sample_rays(cam, batch)
            out = render_rays(self.model, self.params, origins, dirs,
                              self.cfg, jax.random.PRNGKey(0),
                              stratified=False)
            outs.append(np.asarray(out.rgb))
        return np.concatenate(outs).reshape(h, w, 3)
