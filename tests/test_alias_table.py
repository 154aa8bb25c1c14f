"""Alias-table construction goldens + sampling distribution sanity."""

import numpy as np
import pytest

from beta_recsys_tpu.utils.alias_table import AliasTable


def test_construction_list():
    t = AliasTable([6, 4, 1, 1])
    assert t.vocab_size == 4
    assert round(t.prob_arr[0], 2) == 1.0
    assert round(t.prob_arr[1], 2) == 0.67
    assert round(t.prob_arr[2], 2) == 0.33
    assert round(t.prob_arr[3], 2) == 0.33
    assert list(t.alias_arr) == [0, 0, 0, 1]


def test_construction_dict_labels():
    t = AliasTable({100: 6, 102: 4, 103: 1, 104: 1})
    assert t.index2Label == [100, 102, 103, 104]
    samples = t.sample(1000)
    assert set(samples) <= {100, 102, 103, 104}


def test_sampling_distribution():
    np.random.seed(0)
    freqs = [5, 3, 1, 1]
    t = AliasTable(freqs)
    samples = np.array(t.sample(50_000))
    counts = np.bincount(samples, minlength=4) / len(samples)
    expected = np.array(freqs) / sum(freqs)
    np.testing.assert_allclose(counts, expected, atol=0.02)


def test_no_repeat():
    t = AliasTable([1] * 10)
    s = t.sample(10, 1, True)
    assert sorted(s) == list(range(10))
    with pytest.raises(ValueError):
        t.sample(11, 1, True)


def test_device_alias_sampling_matches():
    import jax
    import jax.numpy as jnp

    from beta_recsys_tpu.ops.sampling import alias_sample

    freqs = [8, 4, 2, 1, 1]
    t = AliasTable(freqs)
    rng = jax.random.key(0)
    draws = alias_sample(rng, jnp.asarray(t.prob_arr, jnp.float32), jnp.asarray(t.alias_arr), (100_000,))
    counts = np.bincount(np.asarray(draws), minlength=5) / 100_000
    expected = np.array(freqs) / sum(freqs)
    np.testing.assert_allclose(counts, expected, atol=0.01)
