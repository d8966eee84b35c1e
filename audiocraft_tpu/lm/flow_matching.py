"""JASCO flow matching over EnCodec latents.

Re-design of ``/root/reference/audiocraft/models/flow_matching.py``:
* ``FlowMatchingModel`` (:121-343): temporal symbolic conditions concatenated
  on the feature axis, linear input embedding, U-net transformer, DDPM-style
  sinusoidal time embedding through a swish MLP added to the cross-attention
  input, linear vector-field head.
* Multi-source CFG (:345-418): weighted combination of (all-conditions,
  text-only, null) vector-field terms.
* Sampling (:478-514): fixed-step Euler/Heun integrators plus an adaptive
  Dormand-Prince RK45 ('dopri5', matching the reference's torchdiffeq path)
  implemented as a fixed-shape ``lax.while_loop`` — the whole adaptive solve
  compiles to a single TPU program.
"""

from __future__ import annotations

import dataclasses
import math
import typing as tp

import jax
import jax.numpy as jnp

from ..cond.fuser import ConditionFuser, ConditionType
from ..nn.transformer import layer_norm
from ..nn.unet_transformer import UnetTransformer

# temporal JASCO conditions concatenated on the feature axis, in order
TEMPORAL_CONDS = ('chords', 'self_wav', 'melody')


def timestep_embedding(t: jax.Array, dim: int) -> jax.Array:
    """DDPM sinusoidal embedding (flow_matching.py:211-231)."""
    half_dim = dim // 2
    emb = math.log(10000) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    args = t.reshape(-1).astype(jnp.float32)[:, None] * freqs[None, :]
    out = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        out = jnp.pad(out, ((0, 0), (0, 1)))
    return out


@dataclasses.dataclass(frozen=True, eq=False)
class FlowMatchingModel:
    fuser: ConditionFuser
    dim: int = 128
    num_heads: int = 8
    num_layers: int = 8
    flow_dim: int = 128
    chords_dim: int = 0
    drums_dim: int = 0
    melody_dim: int = 0
    hidden_scale: int = 4
    norm_first: bool = True
    bias_proj: bool = True
    time_embedding_dim: int = 128
    cfg_coef: float = 1.0
    skip_connections: bool = True
    activation: str = 'gelu'
    # flash-fused self-attention over the latent sequence (opt-in)
    attn_kernel: tp.Union[bool, str] = False

    @property
    def input_dim(self) -> int:
        return self.flow_dim + self.chords_dim + self.drums_dim + self.melody_dim

    @property
    def transformer(self) -> UnetTransformer:
        return UnetTransformer(
            d_model=self.dim, num_heads=self.num_heads,
            num_layers=self.num_layers,
            dim_feedforward=int(self.hidden_scale * self.dim),
            norm_first=self.norm_first, causal=False, cross_attention=True,
            activation=self.activation, skip_connections=self.skip_connections,
            attn_kernel=self.attn_kernel)

    def init(self, key: jax.Array) -> dict:
        keys = jax.random.split(key, 6)
        d1, d2 = self.time_embedding_dim, 4 * self.time_embedding_dim

        def linear(k, out_d, in_d, bias=True):
            bound = 1.0 / math.sqrt(in_d)
            p = {'weight': jax.random.uniform(k, (out_d, in_d),
                                              minval=-bound, maxval=bound)}
            if bias:
                p['bias'] = jnp.zeros((out_d,))
            return p

        params = {
            'emb': linear(keys[0], self.dim, self.input_dim, bias=False),
            'transformer': self.transformer.init(keys[1]),
            'linear': linear(keys[2], self.flow_dim, self.dim,
                             bias=self.bias_proj),
            'temb_dense0': linear(keys[3], d2, d1),
            'temb_dense1': linear(keys[4], d2, d2),
            'temb_proj': linear(keys[5], self.dim, d2),
        }
        if self.norm_first:
            params['out_norm'] = {'weight': jnp.ones((self.dim,)),
                                  'bias': jnp.zeros((self.dim,))}
        return params

    def _embed_time(self, params: dict, t: jax.Array) -> jax.Array:
        temb = timestep_embedding(t, self.time_embedding_dim)
        h = temb @ params['temb_dense0']['weight'].T + params['temb_dense0']['bias']
        h = h * jax.nn.sigmoid(h)  # swish
        return h @ params['temb_dense1']['weight'].T + params['temb_dense1']['bias']

    def _align_seq_length(self, cond: jax.Array, seq_len: int) -> jax.Array:
        cond = cond[:, :seq_len, :]
        B, T, C = cond.shape
        if T < seq_len:
            cond = jnp.concatenate(
                [cond, jnp.zeros((B, seq_len - T, C), cond.dtype)], axis=1)
        return cond

    def forward(self, params: dict, latents: jax.Array, t: jax.Array,
                condition_tensors: tp.Dict[str, ConditionType]) -> jax.Array:
        """latents [B, T, flow_dim], t [B or 1] -> vector field [B, T, flow_dim]."""
        B, T, D = latents.shape
        x = latents
        for cond in TEMPORAL_CONDS:
            if cond not in condition_tensors:
                continue
            c = self._align_seq_length(condition_tensors[cond][0], T)
            x = jnp.concatenate([x, c.astype(x.dtype)], axis=-1)

        input_ = x @ params['emb']['weight'].T
        fuser_conds = {k: v for k, v in condition_tensors.items()
                       if k not in TEMPORAL_CONDS}
        input_, cross = self.fuser(input_, fuser_conds)

        t_embs = self._embed_time(params, t)
        t_proj = t_embs @ params['temb_proj']['weight'].T \
            + params['temb_proj']['bias']
        if cross is None:
            cross = t_proj[:, None, :] * jnp.ones((B, 1, self.dim))
        else:
            cross = cross + t_proj[:, None, :]

        out, _ = self.transformer(params['transformer'], input_,
                                  cross_attention_src=cross)
        if 'out_norm' in params:
            out = layer_norm(out, **params['out_norm'])
        v_theta = out @ params['linear']['weight'].T
        if 'bias' in params['linear']:
            v_theta = v_theta + params['linear']['bias']
        if self.fuser.has_prepend:
            v_theta = v_theta[:, -T:]
        return v_theta

    # -------------------------------------------------------------- generate
    def estimated_vector_field(self, params, z, t, condition_tensors,
                               cfg_weights: tp.Sequence[float]) -> jax.Array:
        """Multi-source CFG: condition_tensors holds len(cfg_weights) groups
        stacked along the batch axis (flow_matching.py:387-418)."""
        n_terms = len(cfg_weights)
        if n_terms > 1:
            z = jnp.tile(z, (n_terms, 1, 1))
            t = jnp.tile(jnp.broadcast_to(t, (z.shape[0] // n_terms,)), (n_terms,))
        v = self.forward(params, z, t, condition_tensors)
        if n_terms <= 1:
            return v
        B = v.shape[0] // n_terms
        terms = jnp.split(v, n_terms, axis=0)
        return sum(w * term for w, term in zip(cfg_weights, terms))

    def generate(self, params: dict, key: jax.Array,
                 condition_tensors: tp.Dict[str, ConditionType],
                 cfg_weights: tp.Sequence[float] = (1.0,),
                 num_samples: int = 1, max_gen_len: int = 500,
                 euler_steps: int = 100, method: str = 'euler',
                 ode_atol: float = 1e-5, ode_rtol: float = 1e-5,
                 ode_max_steps: int = 512) -> jax.Array:
        """Integrate dz/dt = v_theta from z_0 ~ N(0, I) over t in [0, 1].

        ``method``: 'euler' / 'heun' fixed-step, or 'dopri5' — adaptive
        Dormand-Prince RK45 matching the reference's torchdiffeq path
        (flow_matching.py:478-514) as a fixed-shape ``lax.while_loop`` so the
        whole solve stays one compiled TPU program.
        """
        z = jax.random.normal(key, (num_samples, max_gen_len, self.flow_dim))
        vf = lambda zz, tt: self.estimated_vector_field(
            params, zz, tt, condition_tensors, cfg_weights)
        if method == 'dopri5':
            return _dopri5(vf, z, t1=1.0 - 1e-5, atol=ode_atol, rtol=ode_rtol,
                           max_steps=ode_max_steps)
        dt = 1.0 / euler_steps
        t = jnp.zeros(())
        for _ in range(euler_steps):
            v = vf(z, t)
            if method == 'heun':
                v2 = vf(z + dt * v, t + dt)
                z = z + dt * 0.5 * (v + v2)
            else:
                z = z + dt * v
            t = t + dt
        return z


# Dormand-Prince RK45 tableau (the classic dopri5 coefficients, shared with
# torchdiffeq's default solver that the reference calls at
# flow_matching.py:478-514).
_DOPRI_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DOPRI_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DOPRI_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DOPRI_B4 = (5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
             187 / 2100, 1 / 40)


def _dopri5(vf, z0: jax.Array, t1: float, atol: float, rtol: float,
            max_steps: int) -> jax.Array:
    """Adaptive RK45 with a standard step-size controller, as one
    ``lax.while_loop`` (fixed shapes, bounded evals: 6 new per trial step
    thanks to FSAL).  Integrates t: 0 -> t1."""

    def rms_err_ratio(err, z, z_new):
        scale = atol + rtol * jnp.maximum(jnp.abs(z), jnp.abs(z_new))
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    def step_once(carry):
        z, t, dt, k1, n = carry
        ks = [k1]
        for i in range(1, 7):
            zi = z + dt * sum(a * k for a, k in zip(_DOPRI_A[i], ks))
            ks.append(vf(zi, t + _DOPRI_C[i] * dt))
        z5 = z + dt * sum(b * k for b, k in zip(_DOPRI_B5, ks))
        err = dt * sum((b5 - b4) * k
                       for b5, b4, k in zip(_DOPRI_B5, _DOPRI_B4, ks))
        ratio = rms_err_ratio(err, z, z5)
        accept = ratio <= 1.0
        # PI-free controller: factor = 0.9 * ratio^(-1/5), clipped
        factor = jnp.clip(0.9 * jnp.power(jnp.maximum(ratio, 1e-10), -0.2),
                          0.2, 10.0)
        t_new = jnp.where(accept, t + dt, t)
        z_new = jax.tree.map(lambda a, b: jnp.where(accept, a, b), z5, z)
        # FSAL: k7 is the vf at (z5, t+dt) — reuse as next k1 when accepted
        k1_new = jnp.where(accept, ks[6], k1)
        dt_new = jnp.minimum(dt * factor, t1 - t_new)
        dt_new = jnp.maximum(dt_new, 1e-6)
        return z_new, t_new, dt_new, k1_new, n + 1

    def cond(carry):
        _, t, _, _, n = carry
        return jnp.logical_and(t < t1 - 1e-8, n < max_steps)

    t0 = jnp.zeros(())
    k1 = vf(z0, t0)
    dt0 = jnp.asarray(0.01)
    z, t, _, _, n = jax.lax.while_loop(
        cond, step_once, (z0, t0, dt0, k1, jnp.zeros((), jnp.int32)))
    return z
