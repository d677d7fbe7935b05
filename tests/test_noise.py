import numpy as np

from consistent__style_transfer_tpu.data.noise import align, rand_perm, transfer_noise


def _sentences(rng, n=32, lo=4, hi=18):
    return [list(rng.integers(4, 100, size=rng.integers(lo, hi))) for _ in range(n)]


def test_transfer_noise_preserves_multiset(rng):
    sents = _sentences(rng)
    noised = transfer_noise(sents, p=0.15, rng=rng)
    flat_in = sorted(t for s in sents for t in s)
    flat_out = sorted(t for s in noised for t in s)
    assert flat_in == flat_out  # tokens are moved, never created/destroyed
    assert len(noised) == len(sents)


def test_transfer_noise_moves_tokens(rng):
    sents = _sentences(rng)
    noised = transfer_noise(sents, p=0.5, rng=rng)
    assert any(a != b for a, b in zip(sents, noised))


def test_transfer_noise_p0_identity(rng):
    sents = _sentences(rng)
    noised = transfer_noise(sents, p=0.0, rng=rng)
    assert noised == [list(s) for s in sents]


def test_rand_perm_preserves_lengths_and_multiset(rng):
    sents = _sentences(rng)
    out = rand_perm(sents, p=0.15, rng=rng)
    assert [len(s) for s in out] == [len(s) for s in sents]
    assert sorted(t for s in out for t in s) == sorted(t for s in sents for t in s)


def test_rand_perm_rate(rng):
    sents = [list(rng.integers(4, 10_000, size=20)) for _ in range(200)]
    out = rand_perm(sents, p=0.15, rng=rng)
    flat_in = [t for s in sents for t in s]
    flat_out = [t for s in out for t in s]
    changed = sum(a != b for a, b in zip(flat_in, flat_out))
    # ~15% selected; a shuffled token keeps its slot with prob ~1/k, so the
    # observed change rate is a bit under 0.15
    assert 0.05 < changed / len(flat_in) < 0.25


def test_align_shapes(rng):
    sents = [[1, 2, 3], [4] * 10, []]
    ids, lengths = align(sents, pad_value=0, max_len=5)
    assert ids.shape == (3, 5)
    assert lengths.tolist() == [3, 5, 0]
    assert ids[0].tolist() == [1, 2, 3, 0, 0]
    assert ids[1].tolist() == [4] * 5
    np.testing.assert_array_equal(ids[2], 0)


def test_seeded_determinism():
    r1 = np.random.default_rng(7)
    r2 = np.random.default_rng(7)
    sents = [[1, 2, 3, 4, 5], [6, 7, 8, 9], [10, 11, 12]]
    assert transfer_noise(sents, 0.3, r1) == transfer_noise(sents, 0.3, r2)


# ----------------------------------------------------- array-native variants

def _padded(rng, n=32, lo=4, hi=18, max_len=18):
    from consistent__style_transfer_tpu.data.corpus import StyleCorpus

    sents = _sentences(rng, n=n, lo=lo, hi=hi)
    c = StyleCorpus.from_sentences(sents, np.zeros(n, np.int32), max_len)
    return c.ids, c.lengths


def _multiset(ids, lens):
    valid = np.arange(ids.shape[1])[None, :] < lens[:, None]
    return sorted(ids[valid].tolist())


def test_transfer_noise_arrays_preserves_multiset(rng):
    from consistent__style_transfer_tpu.data.noise import transfer_noise_arrays

    ids, lens = _padded(rng)
    out, olens = transfer_noise_arrays(ids, lens, p=0.15, rng=rng, out_len=27)
    # out_len=27 > max possible (every token dropped still fits), so nothing
    # is truncated and the token multiset is exactly preserved
    assert _multiset(out, olens) == _multiset(ids, lens)
    # pad slots stay PAD
    valid = np.arange(out.shape[1])[None, :] < olens[:, None]
    assert (out[~valid] == 0).all()


def test_transfer_noise_arrays_p0_identity(rng):
    from consistent__style_transfer_tpu.data.noise import transfer_noise_arrays

    ids, lens = _padded(rng)
    out, olens = transfer_noise_arrays(ids, lens, p=0.0, rng=rng, out_len=18)
    np.testing.assert_array_equal(out, ids)
    np.testing.assert_array_equal(olens, lens)


def test_transfer_noise_arrays_truncates_to_out_len(rng):
    from consistent__style_transfer_tpu.data.noise import transfer_noise_arrays

    ids, lens = _padded(rng)
    out, olens = transfer_noise_arrays(ids, lens, p=0.5, rng=rng, out_len=10)
    assert out.shape[1] == 10
    assert (olens <= 10).all()


def test_transfer_noise_arrays_moves_mass(rng):
    from consistent__style_transfer_tpu.data.noise import transfer_noise_arrays

    ids, lens = _padded(rng)
    out, olens = transfer_noise_arrays(ids, lens, p=0.5, rng=rng, out_len=27)
    assert not (np.array_equal(out[:, :18], ids) and np.array_equal(olens, lens))


def test_rand_perm_arrays_invariants(rng):
    from consistent__style_transfer_tpu.data.noise import rand_perm_arrays

    ids, lens = _padded(rng)
    out = rand_perm_arrays(ids, lens, p=0.15, rng=rng)
    assert _multiset(out, lens) == _multiset(ids, lens)
    valid = np.arange(ids.shape[1])[None, :] < lens[:, None]
    assert (out[~valid] == ids[~valid]).all()


def test_rand_perm_arrays_rate(rng):
    from consistent__style_transfer_tpu.data.noise import rand_perm_arrays

    ids = rng.integers(4, 10_000, size=(200, 20)).astype(np.int32)
    lens = np.full(200, 20, np.int32)
    out = rand_perm_arrays(ids, lens, p=0.15, rng=rng)
    changed = (out != ids).mean()
    assert 0.05 < changed < 0.25


def test_collate_pretrain_skips_matcher_work_when_frozen(rng):
    """Once the matcher freezes, the pretrain collate must not run the two
    transfer_noise draws or the per-batch WMD label solve (dead weight for
    every post-freeze epoch); the jit signature stays stable via zeros."""
    from consistent__style_transfer_tpu.data.pipeline import collate_pretrain

    calls = []

    class SpyLabeler:
        def label_pairs(self, nx1, nl1, nx2, nl2):
            calls.append(1)
            return np.ones(len(nx1), np.float32)

    ids, lens = _padded(rng)
    labels = np.zeros(len(ids), np.int64)

    need = [True]
    fn = collate_pretrain(18, SpyLabeler(), need_matcher=lambda: need[0])
    hot = fn(ids, lens, labels, rng)
    assert calls == [1]
    assert hot["nx1"].shape == (len(ids), 27) and hot["wmd"].shape == (len(ids),)

    need[0] = False
    cold = fn(ids, lens, labels, rng)
    assert calls == [1]  # labeler NOT called again
    assert (cold["nx1"] == 0).all() and (cold["nx2"] == 0).all()
    assert (cold["wmd"] == 0).all()
    # same shapes/dtypes -> same XLA program signature
    for k in hot:
        assert hot[k].shape == cold[k].shape and hot[k].dtype == cold[k].dtype
