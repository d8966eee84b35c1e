"""LM forward / compute_predictions / greedy generate parity vs reference."""

import numpy as np
import pytest

from oracle import ref_module, to_np, to_torch

import jax
import jax.numpy as jnp

from audiocraft_tpu.cond.fuser import ConditionFuser
from audiocraft_tpu.lm.model import LMModel
from audiocraft_tpu.patterns import DelayedPatternProvider
from audiocraft_tpu.ckpt.torch_import import import_lm


N_Q, CARD, DIM, HEADS, LAYERS = 4, 60, 16, 4, 2


class _FakeProvider:
    """Stands in for the reference ConditioningProvider: returns fixed
    precomputed condition tensors, bypassing spacy/T5 tokenization."""

    def __init__(self, tensors):
        self.tensors = tensors

    def tokenize(self, conditions):
        return {"n": len(conditions)}

    def __call__(self, tokenized):
        n = tokenized["n"]
        cond, mask = self.tensors
        return {"description": (cond[:n], mask[:n])}


def _make_ref_lm(seed=21):
    import torch
    ref_lm_mod = ref_module("audiocraft.models.lm")
    ref_pat = ref_module("audiocraft.modules.codebooks_patterns")
    ref_cond = ref_module("audiocraft.modules.conditioners")
    torch.manual_seed(seed)
    pattern = ref_pat.DelayedPatternProvider(n_q=N_Q)
    fuser = ref_cond.ConditionFuser(
        {"cross": ["description"], "prepend": [], "sum": [],
         "input_interpolate": []})
    lm = ref_lm_mod.LMModel(
        pattern, None, fuser, n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS,
        custom=True, num_layers=LAYERS, cross_attention=True, causal=True,
        dropout=0.0)
    lm.eval()
    return lm


def _make_our_lm():
    fuser = ConditionFuser.from_dict(
        {"cross": ("description",), "prepend": (), "sum": (),
         "input_interpolate": ()})
    return LMModel(pattern_provider=DelayedPatternProvider(N_Q), fuser=fuser,
                   n_q=N_Q, card=CARD, dim=DIM, num_heads=HEADS,
                   num_layers=LAYERS, cross_attention=True, causal=True,
                   norm_first=False, activation='relu', cfg_coef=3.0)


def _import(ref, our):
    sd = {k: to_np(v) for k, v in ref.state_dict().items()}
    return jax.tree.map(jnp.asarray, import_lm(our, sd))


def _cond(B, Tc=5, seed=3):
    rng = np.random.RandomState(seed)
    cond = rng.randn(B, Tc, DIM).astype(np.float32)
    mask = np.ones((B, Tc), dtype=np.int64)
    return cond, mask


def test_lm_forward_parity():
    import torch
    ref = _make_ref_lm()
    ours = _make_our_lm()
    params = _import(ref, ours)

    B, S = 2, 9
    seq = np.random.RandomState(0).randint(0, CARD, (B, N_Q, S))
    cond, mask = _cond(B)
    with torch.no_grad():
        logits_ref = to_np(ref(
            to_torch(seq), [],
            condition_tensors={"description": (to_torch(cond), to_torch(mask))}))

    logits, _ = ours.forward(params, jnp.asarray(seq),
                             {"description": (jnp.asarray(cond), jnp.asarray(mask))})
    np.testing.assert_allclose(np.asarray(logits), logits_ref, atol=5e-5, rtol=1e-4)


def test_lm_compute_predictions_parity():
    import torch
    ref = _make_ref_lm()
    ours = _make_our_lm()
    params = _import(ref, ours)

    B, T = 2, 7
    codes = np.random.RandomState(1).randint(0, CARD, (B, N_Q, T))
    cond, mask = _cond(B)
    with torch.no_grad():
        out_ref = ref.compute_predictions(
            to_torch(codes), [],
            condition_tensors={"description": (to_torch(cond), to_torch(mask))})

    out = ours.compute_predictions(
        params, jnp.asarray(codes),
        {"description": (jnp.asarray(cond), jnp.asarray(mask))})
    assert (np.asarray(out.mask) == to_np(out_ref.mask)).all()
    np.testing.assert_allclose(np.asarray(out.logits), to_np(out_ref.logits),
                               atol=5e-5, rtol=1e-4, equal_nan=True)


@pytest.mark.parametrize("prompt_len", [0, 3])
def test_lm_greedy_generate_parity(prompt_len):
    import torch
    ref = _make_ref_lm()
    ours = _make_our_lm()
    params = _import(ref, ours)

    B, max_gen_len = 2, 10
    # CFG doubles the batch: provide 2B condition rows (cond + null)
    cond, mask = _cond(2 * B, seed=7)
    ref.condition_provider = _FakeProvider((to_torch(cond), to_torch(mask)))

    ref_cond_mod = ref_module("audiocraft.modules.conditioners")
    conditions = [ref_cond_mod.ConditioningAttributes(text={"description": "x"})
                  for _ in range(B)]

    prompt_np = None
    prompt = None
    if prompt_len:
        prompt_np = np.random.RandomState(2).randint(
            0, CARD, (B, N_Q, prompt_len))
        prompt = to_torch(prompt_np)

    with torch.no_grad():
        tokens_ref = to_np(ref.generate(
            prompt=prompt, conditions=conditions, num_samples=B,
            max_gen_len=max_gen_len, use_sampling=False, cfg_coef=3.0))

    tokens = ours.generate(
        params, jax.random.PRNGKey(0),
        prompt=None if prompt_np is None else jnp.asarray(prompt_np),
        condition_tensors={"description": (jnp.asarray(cond), jnp.asarray(mask))},
        num_samples=B, max_gen_len=max_gen_len, use_sampling=False,
        cfg_coef=3.0)
    tokens = np.asarray(tokens)
    assert tokens.shape == tokens_ref.shape
    match = (tokens == tokens_ref).mean()
    assert match == 1.0, f"greedy token match {match:.4f} != 1.0"


def test_lm_generate_sampling_shapes():
    ours = _make_our_lm()
    params = ours.init(jax.random.PRNGKey(0))
    cond, mask = _cond(2, seed=11)
    tokens = ours.generate(
        params, jax.random.PRNGKey(1),
        condition_tensors={"description": (jnp.asarray(cond), jnp.asarray(mask))},
        num_samples=1, max_gen_len=8, use_sampling=True, temp=1.0, top_k=50)
    tokens = np.asarray(tokens)
    assert tokens.shape == (1, N_Q, 8)
    assert (tokens >= 0).all() and (tokens <= CARD).all()


def test_lm_two_step_cfg_matches_one_pass_greedy():
    """Two-step CFG and 1-pass CFG compute identical greedy tokens when the
    condition tensors agree (the reference keeps both paths for padding
    equivalence checks, lm.py:378-399)."""
    ours = _make_our_lm()
    params = ours.init(jax.random.PRNGKey(0))
    B, max_gen_len = 2, 8
    cond, mask = _cond(B, seed=13)
    null_cond = np.zeros_like(cond)
    null_mask = np.zeros_like(mask)

    stacked = {"description": (jnp.asarray(np.concatenate([cond, null_cond])),
                               jnp.asarray(np.concatenate([mask, null_mask])))}
    tokens1 = ours.generate(params, jax.random.PRNGKey(1),
                            condition_tensors=stacked, num_samples=B,
                            max_gen_len=max_gen_len, use_sampling=False,
                            cfg_coef=3.0)

    pair = ({"description": (jnp.asarray(cond), jnp.asarray(mask))},
            {"description": (jnp.asarray(null_cond), jnp.asarray(null_mask))})
    tokens2 = ours.generate(params, jax.random.PRNGKey(1),
                            condition_tensors=pair, num_samples=B,
                            max_gen_len=max_gen_len, use_sampling=False,
                            cfg_coef=3.0, two_step_cfg=True)
    assert (np.asarray(tokens1) == np.asarray(tokens2)).all()


def test_lm_double_cfg_runs():
    """Double CFG (cfg_coef_beta, MusicGen-Style) with 3 condition groups."""
    ours = _make_our_lm()
    params = ours.init(jax.random.PRNGKey(0))
    B, max_gen_len = 1, 8
    cond, mask = _cond(3 * B, seed=17)
    tokens = ours.generate(
        params, jax.random.PRNGKey(2),
        condition_tensors={"description": (jnp.asarray(cond),
                                           jnp.asarray(mask))},
        num_samples=B, max_gen_len=max_gen_len, use_sampling=False,
        cfg_coef=3.0, cfg_coef_beta=4.0)
    tokens = np.asarray(tokens)
    assert tokens.shape == (B, N_Q, max_gen_len)
    assert (tokens >= 0).all() and (tokens <= CARD).all()


def test_scan_layers_matches_loop():
    """scan-over-layers decode (one layer body in the program) is
    token-identical to the unrolled loop, with and without prompts."""
    import dataclasses
    ref = _make_ref_lm()
    ours = _make_our_lm()
    params = _import(ref, ours)
    ours_scan = dataclasses.replace(ours, scan_layers=True)
    cond, mask = _cond(4)
    ct = {"description": (jnp.asarray(cond), jnp.asarray(mask))}

    la, _ = ours.forward(params, jnp.zeros((4, N_Q, 5), jnp.int32), ct)
    lb, _ = ours_scan.forward(params, jnp.zeros((4, N_Q, 5), jnp.int32), ct)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-5)

    for prompt_len in (0, 3):
        prompt = (None if prompt_len == 0 else
                  jnp.asarray(np.random.RandomState(1).randint(
                      0, CARD, size=(2, N_Q, prompt_len))))
        ta = ours.generate(params, jax.random.PRNGKey(3),
                           prompt=prompt, condition_tensors=ct,
                           num_samples=2, max_gen_len=9, use_sampling=False)
        tb = ours_scan.generate(params, jax.random.PRNGKey(3),
                                prompt=prompt, condition_tensors=ct,
                                num_samples=2, max_gen_len=9,
                                use_sampling=False)
        assert (np.asarray(ta) == np.asarray(tb)).all()


def test_int8_weight_only_quantization():
    """Weight-only int8 (lm/quantize.py): logits near-identical at real
    hidden width and greedy decode token-identical on the parity model."""
    from audiocraft_tpu.lm.quantize import quantize_lm_params
    ref = _make_ref_lm()
    ours = _make_our_lm()
    params = _import(ref, ours)
    pq = quantize_lm_params(params)
    cond, mask = _cond(4)
    ct = {"description": (jnp.asarray(cond), jnp.asarray(mask))}
    seq = jnp.asarray(np.random.RandomState(2).randint(
        0, CARD, size=(4, N_Q, 6)))
    la, _ = ours.forward(params, seq, ct)
    lb, _ = ours.forward(pq, seq, ct)
    rel = float(jnp.abs(la - lb).max() / jnp.abs(la).max())
    assert rel < 0.02, rel
    ta = ours.generate(params, jax.random.PRNGKey(3), condition_tensors=ct,
                       num_samples=2, max_gen_len=9, use_sampling=False)
    tb = ours.generate(pq, jax.random.PRNGKey(3), condition_tensors=ct,
                       num_samples=2, max_gen_len=9, use_sampling=False)
    assert (np.asarray(ta) == np.asarray(tb)).all()


def test_int8_kv_cache_decode():
    """int8 KV-cache decode (nn/transformer KVCache quantized storage):
    greedy tokens track the float-cache decode on the parity model (small
    quantization noise can only flip near-tie argmaxes) and the prompted
    path runs."""
    ref = _make_ref_lm()
    ours = _make_our_lm()
    params = _import(ref, ours)
    cond, mask = _cond(4)
    ct = {"description": (jnp.asarray(cond), jnp.asarray(mask))}
    ta = ours.generate(params, jax.random.PRNGKey(3), condition_tensors=ct,
                       num_samples=2, max_gen_len=9, use_sampling=False)
    tb = ours.generate(params, jax.random.PRNGKey(3), condition_tensors=ct,
                       num_samples=2, max_gen_len=9, use_sampling=False,
                       kv_dtype='int8')
    a, b = np.asarray(ta), np.asarray(tb)
    assert b.shape == a.shape
    assert ((0 <= b) & (b < CARD)).all()
    # near-complete greedy agreement; quantization may flip rare ties
    assert (a == b).mean() > 0.9, (a == b).mean()
    # prompted (prefill) path
    prompt = jnp.asarray(np.random.RandomState(5).randint(
        0, CARD, size=(2, N_Q, 3)))
    tc = ours.generate(params, jax.random.PRNGKey(4), condition_tensors=ct,
                       num_samples=2, max_gen_len=9, prompt=prompt,
                       use_sampling=False, kv_dtype='int8')
    assert np.asarray(tc).shape == (2, N_Q, 9)


def test_kv_buckets_token_exact():
    """Bucketed KV-cache growth (kv_buckets) is token-EXACT vs the single
    full-capacity buffer: padded cache positions are causally masked to
    -inf so every segment's softmax is bit-identical.  Covers sampled +
    greedy, prompted + unprompted, float + int8 caches, and the segment
    planner's arithmetic."""
    from audiocraft_tpu.lm.model import _plan_cache_segments

    ours = _make_our_lm()
    params = ours.init(jax.random.PRNGKey(0))
    cond, mask = _cond(4)
    ct = {"description": (jnp.asarray(cond), jnp.asarray(mask))}

    for kv_dtype in (None, 'int8'):
        for prompt_len in (0, 5):
            prompt = None
            if prompt_len:
                prompt = jnp.asarray(np.random.RandomState(6).randint(
                    0, CARD, size=(2, N_Q, prompt_len)))
            kw = dict(condition_tensors=ct, num_samples=2, max_gen_len=24,
                      prompt=prompt, use_sampling=True, top_k=20,
                      kv_dtype=kv_dtype)
            ta = ours.generate(params, jax.random.PRNGKey(3), **kw)
            tb = ours.generate(params, jax.random.PRNGKey(3),
                               kv_buckets=(8, 16), **kw)
            np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))

    # greedy + 'auto' ladder (auto buckets are >= 256, so force tiny ones too)
    ta = ours.generate(params, jax.random.PRNGKey(5), condition_tensors=ct,
                       num_samples=2, max_gen_len=20, use_sampling=False)
    for buckets in ('auto', (4, 8, 12, 16)):
        tb = ours.generate(params, jax.random.PRNGKey(5), condition_tensors=ct,
                           num_samples=2, max_gen_len=20, use_sampling=False,
                           kv_buckets=buckets)
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))

    # two-step CFG (tuple caches) and scan_layers (stacked caches) both
    # grow through the same pytree path
    null_ct = {"description": (jnp.zeros_like(ct["description"][0][:2]),
                               jnp.zeros_like(ct["description"][1][:2]))}
    cond2 = {"description": (ct["description"][0][:2], ct["description"][1][:2])}
    ta = ours.generate(params, jax.random.PRNGKey(7),
                       condition_tensors=(cond2, null_ct), num_samples=2,
                       max_gen_len=20, use_sampling=False, two_step_cfg=True)
    tb = ours.generate(params, jax.random.PRNGKey(7),
                       condition_tensors=(cond2, null_ct), num_samples=2,
                       max_gen_len=20, use_sampling=False, two_step_cfg=True,
                       kv_buckets=(8, 16))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))

    import dataclasses as _dc
    scanned = _dc.replace(ours, scan_layers=True)
    ta = scanned.generate(params, jax.random.PRNGKey(8), condition_tensors=ct,
                          num_samples=2, max_gen_len=20, use_sampling=False)
    tb = scanned.generate(params, jax.random.PRNGKey(8), condition_tensors=ct,
                          num_samples=2, max_gen_len=20, use_sampling=False,
                          kv_buckets=(8, 16))
    np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))

    # planner invariants: segments tile [first, S); every write fits
    for first, S, prepend in [(1, 60, 0), (7, 60, 3), (59, 60, 2), (60, 60, 0)]:
        segs = _plan_cache_segments(first, S, prepend, [8, 16, 32])
        assert segs[0][0] == first and segs[-1][1] == S
        prev_end, prev_cap = first, 0
        for a, b, cap in segs:
            assert a == prev_end and cap >= prev_cap
            assert cap >= prepend + max(a, first)        # prefill/write fits
            if b > a:
                assert prepend + b - 1 <= cap            # last write fits
            prev_end, prev_cap = b, cap
        assert segs[-1][2] == S + prepend or first >= S


def test_int4_weight_only_quantization():
    """Weight-only int4 with input-group scales (lm/quantize.py): matmul-site
    dequant agrees with the explicit dequantized weights, logits stay within
    the coarser int4 tolerance, decode produces valid tokens."""
    from audiocraft_tpu.lm.quantize import (quantize_lm_params,
                                            quantize_weight_int4,
                                            dequantize_weight)
    # leaf roundtrip error bound: symmetric RTN with 7 levels per side
    w = jnp.asarray(np.random.RandomState(0).randn(16, 256).astype(np.float32))
    leaf = quantize_weight_int4(w, group_size=64)
    assert leaf['q4p'].dtype == jnp.int8 and leaf['q4p'].shape == (16, 128)
    assert leaf['s'].shape == (16, 4)
    # pack/unpack roundtrip is exact over the full nibble range
    from audiocraft_tpu.lm.quantize import pack_int4, unpack_int4
    vals = jnp.asarray(np.random.RandomState(7).randint(-8, 8, (5, 32)),
                       jnp.int8)
    assert (unpack_int4(pack_int4(vals)) == vals).all()
    wd = dequantize_weight(leaf)
    # max error <= half a step = s/2 per group
    step = np.asarray(leaf['s'])
    assert float(jnp.max(jnp.abs(wd - w) / step.repeat(64, -1))) <= 0.5 + 1e-3

    # linear_w int4 path == x @ dequant(W).T
    from audiocraft_tpu.nn.transformer import linear_w
    x = jnp.asarray(np.random.RandomState(1).randn(3, 256).astype(np.float32))
    ya = linear_w(x, leaf)
    yb = x @ dequantize_weight(leaf).T
    assert float(jnp.max(jnp.abs(ya - yb))) < 1e-3 * float(jnp.max(jnp.abs(yb)))

    ref = _make_ref_lm()
    ours = _make_our_lm()
    params = _import(ref, ours)
    pq = quantize_lm_params(params, mode='int4', group_size=64)
    cond, mask = _cond(4)
    ct = {"description": (jnp.asarray(cond), jnp.asarray(mask))}
    seq = jnp.asarray(np.random.RandomState(2).randint(
        0, CARD, size=(4, N_Q, 6)))
    la, _ = ours.forward(params, seq, ct)
    lb, _ = ours.forward(pq, seq, ct)
    rel = float(jnp.abs(la - lb).max() / jnp.abs(la).max())
    assert rel < 0.15, rel
    tb = ours.generate(pq, jax.random.PRNGKey(3), condition_tensors=ct,
                       num_samples=2, max_gen_len=9, use_sampling=False)
    arr = np.asarray(tb)
    assert arr.shape == (2, N_Q, 9) and (arr >= 0).all() and (arr < CARD).all()


def test_facade_quantize_lm_weights():
    from audiocraft_tpu.gen.musicgen import get_debug_musicgen
    mg = get_debug_musicgen(jax.random.PRNGKey(0))
    mg.set_generation_params(duration=0.5)
    a = np.asarray(mg.generate(['quantize me'], key=jax.random.PRNGKey(2)))
    mg.quantize_lm_weights()
    w = mg.lm_params['transformer']['layer0']['self_attn']['in_proj_weight']
    assert isinstance(w, dict) and w['q'].dtype == jnp.int8
    b = np.asarray(mg.generate(['quantize me'], key=jax.random.PRNGKey(2)))
    assert b.shape == a.shape and np.isfinite(b).all()
