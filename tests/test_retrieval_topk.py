"""retrieval_topk (r5 serving fast path): exactness + exclusion + chunking."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from beta_recsys_tpu.ops.topk import exclusion_lists, retrieval_topk, streaming_topk


@pytest.fixture(scope="module")
def embs():
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(64, 16)).astype(np.float32))
    it = jnp.asarray(rng.normal(size=(500, 16)).astype(np.float32))
    return u, it


def brute_topk(u, it, k, excl=None):
    s = np.asarray(u) @ np.asarray(it).T
    if excl is not None:
        for r in range(s.shape[0]):
            for c in excl[r]:
                if c >= 0:
                    s[r, c] = -np.inf
    idx = np.argsort(-s, axis=1)[:, :k]
    return idx


def test_exact_mode_matches_brute_force(embs):
    u, it = embs
    _, idx = retrieval_topk(u, it, 5, mode="exact", score_dtype=None)
    np.testing.assert_array_equal(np.asarray(idx), brute_topk(u, it, 5))


def test_exclusion_is_exact(embs):
    u, it = embs
    rng = np.random.default_rng(0)
    excl = rng.integers(0, 500, (64, 7)).astype(np.int32)
    _, idx = retrieval_topk(u, it, 5, exclude_list=jnp.asarray(excl),
                            mode="exact", score_dtype=None)
    idx = np.asarray(idx)
    np.testing.assert_array_equal(idx, brute_topk(u, it, 5, excl))
    for r in range(64):
        assert not (set(idx[r]) & set(excl[r].tolist()))


def test_user_chunk_matches_unchunked(embs):
    u, it = embs
    v1, i1 = retrieval_topk(u, it, 4, mode="exact", score_dtype=None)
    v2, i2 = retrieval_topk(u, it, 4, mode="exact", score_dtype=None,
                            user_chunk=16)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-6)


def test_approx_mode_runs_and_is_close(embs):
    # on CPU approx_max_k falls back to an exact reduction; the contract here
    # is shape/dtype + high overlap
    u, it = embs
    _, ia = retrieval_topk(u, it, 5, mode="approx")
    ia, ie = np.asarray(ia), brute_topk(u, it, 5)
    overlap = np.mean([len(set(ia[r]) & set(ie[r])) / 5 for r in range(64)])
    assert ia.shape == (64, 5)
    assert overlap >= 0.8, overlap


def test_exclusion_lists_from_csr():
    import scipy.sparse as sp

    csr = sp.csr_matrix(
        (np.ones(4), ([0, 0, 1, 2], [3, 7, 1, 9])), shape=(4, 12))
    ex = exclusion_lists(csr)
    assert ex.shape == (4, 2)
    assert set(ex[0]) == {3, 7}
    assert ex[1][0] == 1 and ex[1][1] == -1
    assert (ex[3] == -1).all()


def test_matches_streaming_topk(embs):
    u, it = embs
    v1, i1 = retrieval_topk(u, it, 6, mode="exact", score_dtype=None)
    v2, i2 = streaming_topk(u, it, 6, block=128)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_topk_evaluator_fast_path_matches_streaming():
    import scipy.sparse as sp

    from beta_recsys_tpu.core.eval_engine import TopKRetrievalEvaluator
    from beta_recsys_tpu.models.mf import MF

    rng = np.random.default_rng(1)
    n_u, n_i = 80, 300
    model = MF({"model": "MF", "emb_dim": 8, "loss": "bpr"}, n_u, n_i)
    params = model.init_params(jax.random.key(0))
    rel = sp.csr_matrix(
        (np.ones(n_u), (np.arange(n_u), rng.integers(0, n_i, n_u))),
        shape=(n_u, n_i))
    train = sp.csr_matrix(
        (np.ones(n_u * 3), (np.repeat(np.arange(n_u), 3),
                            rng.integers(0, n_i, n_u * 3))), shape=(n_u, n_i))
    train.sum_duplicates()
    fast = TopKRetrievalEvaluator(model, np.arange(n_u), rel, train,
                                  ks=(5, 10), user_block=32)
    assert fast._use_fast
    slow = TopKRetrievalEvaluator(model, np.arange(n_u), rel, train,
                                  ks=(5, 10), user_block=32)
    slow._use_fast = False
    mf_, ms_ = fast.evaluate(params), slow.evaluate(params)
    for k in mf_:
        np.testing.assert_allclose(mf_[k], ms_[k], rtol=1e-6, err_msg=k)
