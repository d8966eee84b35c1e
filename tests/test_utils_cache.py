"""Utils: embedding cache, batch cache, model hash, dtype policy."""

import numpy as np
import jax
import jax.numpy as jnp

from audiocraft_tpu.utils.cache import (CachedBatchLoader, CachedBatchWriter,
                                        EmbeddingCache)
from audiocraft_tpu.utils.misc import (DtypePolicy, length_to_mask, model_hash,
                                       write_and_rename)


def test_embedding_cache_roundtrip(tmp_path):
    calls = []

    def compute(path, x, idx):
        calls.append(path)
        return np.full((4, 3), float(idx), np.float32)

    def extract(full, x, idx):
        return full[:2]

    cache = EmbeddingCache(tmp_path, compute, extract)
    paths = ['a.wav', 'b.wav']
    out = cache.get_embed_from_cache(paths, None)
    assert out.shape == (2, 2, 3)
    assert len(calls) == 2

    # warm in-memory cache from disk; second fetch must not recompute
    cache2 = EmbeddingCache(tmp_path, compute, extract)
    cache2.populate_embed_cache(paths, None)
    out2 = cache2.get_embed_from_cache(paths, None)
    assert len(calls) == 2, "cache hit should not recompute"
    np.testing.assert_array_equal(out, out2)


def test_cached_batch_writer_loader(tmp_path):
    w = CachedBatchWriter(tmp_path, process_index=0)
    w.start_epoch(0)
    for step in range(3):
        w.save(np.full((2, 4), step), np.arange(step + 1))
    other = CachedBatchWriter(tmp_path, process_index=1)
    other.start_epoch(0)
    other.save(np.zeros((2, 4)), np.arange(1))

    loader = CachedBatchLoader(tmp_path, batch_size=2, process_index=0)
    loader.start_epoch(0)
    assert len(loader) == 3
    batches = list(loader)
    assert len(batches) == 3
    np.testing.assert_array_equal(batches[1][0], np.full((2, 4), 1))
    # host 1 sees only its own shard
    loader1 = CachedBatchLoader(tmp_path, batch_size=2, process_index=1)
    loader1.start_epoch(0)
    assert len(loader1) == 1


def test_model_hash_deterministic():
    params = {'a': jnp.arange(5.0), 'b': {'c': jnp.ones((2, 2))}}
    h1 = model_hash(params)
    h2 = model_hash(jax.tree.map(lambda x: x + 0, params))
    assert h1 == h2
    h3 = model_hash({'a': jnp.arange(5.0) + 1, 'b': {'c': jnp.ones((2, 2))}})
    assert h1 != h3


def test_length_to_mask():
    m = np.asarray(length_to_mask(jnp.asarray([3, 5]), max_len=5))
    assert (m == np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], bool)).all()


def test_dtype_policy():
    policy = DtypePolicy(compute_dtype=jnp.bfloat16)
    tree = {'w': jnp.ones((2,), jnp.float32), 'i': jnp.ones((2,), jnp.int32)}
    out = policy.cast_to_compute(tree)
    assert out['w'].dtype == jnp.bfloat16
    assert out['i'].dtype == jnp.int32


def test_write_and_rename(tmp_path):
    p = tmp_path / "f.bin"
    with write_and_rename(p) as f:
        f.write(b"hello")
    assert p.read_bytes() == b"hello"
