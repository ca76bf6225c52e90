import numpy as np
import pytest

from customer_er_spark.functions.hashing import mix_keys, shingle_hashes, splitmix64
from customer_er_spark.functions.minhash import jaccard_estimate, minhash_batch
from customer_er_spark.functions.simhash import simhash64
from customer_er_spark.functions.text import lcs_ratio, longest_common_substring


def brute_lcs(a: str, b: str) -> int:
    best = 0
    for i in range(len(a)):
        for j in range(i + best + 1, len(a) + 1):
            if a[i:j] in b:
                best = j - i
            else:
                break
    return best


def test_lcs_matches_bruteforce():
    rng = np.random.default_rng(3)
    alphabet = "abcdef "
    for _ in range(40):
        a = "".join(rng.choice(list(alphabet), size=rng.integers(0, 40)))
        b = "".join(rng.choice(list(alphabet), size=rng.integers(0, 40)))
        assert longest_common_substring(a, b) == brute_lcs(a, b), (a, b)


def test_lcs_known_cases():
    assert longest_common_substring("hello world", "yello word") == 8  # "ello wor"
    assert longest_common_substring("abc", "abc") == 3
    assert longest_common_substring("abc", "xyz") == 0
    assert longest_common_substring("", "abc") == 0
    assert lcs_ratio("same", "same") == 1.0
    assert lcs_ratio(None, None) == 1.0


def test_shingle_hash_deterministic():
    a = shingle_hashes("the quick brown fox", 5)
    b = shingle_hashes("the quick brown fox", 5)
    np.testing.assert_array_equal(a, b)
    assert len(shingle_hashes("ab", 5)) == 1  # short-string fallback
    assert not np.array_equal(a, shingle_hashes("the quick brown fix", 5))


def test_splitmix_avalanche():
    h = splitmix64(np.arange(1000, dtype=np.uint64))
    assert len(np.unique(h)) == 1000
    ones = sum(bin(int(x)).count("1") for x in h) / (1000 * 64)
    assert 0.45 < ones < 0.55


def test_minhash_jaccard_estimate():
    rng = np.random.default_rng(11)
    vocab = [f"word{i}" for i in range(200)]

    def cap(idx):
        return " ".join(vocab[i] for i in idx)

    base = list(rng.integers(0, 200, 30))
    # near-identical caption (1 word changed) vs unrelated caption
    near = base.copy()
    near[5] = int(rng.integers(0, 200))
    far = list(rng.integers(0, 200, 30))
    texts = [cap(base), cap(near), cap(far)]
    sig = minhash_batch(texts, k=5, num_hashes=256, seed=7)

    def true_jacc(x, y):
        sx, sy = set(shingle_hashes(x, 5)), set(shingle_hashes(y, 5))
        return len(sx & sy) / len(sx | sy)

    est_near = jaccard_estimate(sig[0], sig[1])
    est_far = jaccard_estimate(sig[0], sig[2])
    assert abs(est_near - true_jacc(texts[0], texts[1])) < 0.12
    assert abs(est_far - true_jacc(texts[0], texts[2])) < 0.12
    assert est_near > est_far


def test_minhash_batch_handles_empty_and_none():
    sig = minhash_batch(["", None, "hello world"], k=5, num_hashes=16, seed=1)
    assert sig.shape == (3, 16)
    # empty and None map to the same (max-sentinel) signature
    np.testing.assert_array_equal(sig[0], sig[1])


def test_simhash_near_far():
    a = "the quick brown fox jumps over the lazy dog near the river bank"
    b = "the quick brown fox jumps over the lazy dog near the river edge"
    c = "completely different text about spark shuffle partitions and skew"
    ha, hb, hc = simhash64(a), simhash64(b), simhash64(c)
    ham = lambda x, y: bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")
    assert ham(ha, hb) < ham(ha, hc)
    assert ham(ha, hb) <= 8
    assert simhash64("") == 0


def test_mix_keys_unique():
    k = mix_keys(128, 0x5EED)
    assert len(np.unique(k)) == 128


def test_bloom_membership_and_fp_rate():
    """Manifest blooms (functions/bloom.py): zero false negatives by
    construction; per-key FP well under 1e-3 at the 20-bit default (the
    any-of-k probe in the link reader compounds FP ~k-fold, so the
    per-key rate is the load-bearing number)."""
    from customer_er_spark.functions import bloom

    rng = np.random.default_rng(123)
    keys = rng.integers(-2**63, 2**63 - 1, 5000, dtype=np.int64)
    b = bloom.build(keys)
    # every inserted key is found (probe one at a time: no-FN is per key)
    h1, h2 = bloom.hash_keys(keys)
    for i in range(0, 5000, 97):
        assert bloom.might_contain_any(b, h1[i:i + 1], h2[i:i + 1])
    # any-of probe over the full set
    assert bloom.might_contain_any(b, h1, h2)
    # fresh keys: per-key FP rate under 1e-3
    other = rng.integers(-2**63, 2**63 - 1, 4000, dtype=np.int64)
    o1, o2 = bloom.hash_keys(other)
    fp = sum(
        bloom.might_contain_any(b, o1[i:i + 1], o2[i:i + 1])
        for i in range(4000)
    )
    assert fp / 4000 < 1e-3, fp
    # an all-miss batch probe returns False (the file-skip verdict)
    assert not bloom.might_contain_any(b, o1[:50], o2[:50]) or fp > 0


def test_bloom_empty_and_json_roundtrip():
    import json

    from customer_er_spark.functions import bloom

    b = bloom.build(np.array([], dtype=np.int64))
    h1, h2 = bloom.hash_keys(np.array([42], dtype=np.int64))
    assert not bloom.might_contain_any(b, h1, h2)
    # manifest round-trip: bloom dicts are plain JSON
    b2 = json.loads(json.dumps(bloom.build(np.array([7, -9], dtype=np.int64))))
    k1, k2 = bloom.hash_keys(np.array([7], dtype=np.int64))
    assert bloom.might_contain_any(b2, k1, k2)


def test_bloom_build_sliced_equals_per_slice_build():
    """build_sliced is the vectorized commit-walk twin of build(): same
    probe semantics per slice, and bit-identical to build() whenever the
    slice's own power-of-two table size equals the shared one."""
    import numpy as np

    from customer_er_spark.functions import bloom

    rng = np.random.default_rng(11)
    keys = rng.integers(-(2**62), 2**62, 1000, dtype=np.int64)
    slice_rows = [64] * 14 + [37, 67]
    assert sum(slice_rows) == 1000
    sliced = bloom.build_sliced(keys, slice_rows)
    assert len(sliced) == len(slice_rows)
    off = 0
    for j, rows in enumerate(slice_rows):
        single = bloom.build(keys[off : off + rows])
        if single["m"] == sliced[j]["m"]:  # full-size slices: bit-identical
            assert single == sliced[j]
        # probe semantics hold either way: every member key is contained,
        # and a disjoint random probe set is (almost surely) rejected
        h_in = bloom.hash_keys(keys[off : off + rows])
        assert bloom.might_contain_any(sliced[j], h_in[0][:1], h_in[1][:1])
        h_out = bloom.hash_keys(
            rng.integers(-(2**62), 2**62, 3, dtype=np.int64)
        )
        # 3 random keys vs a ~1e-4/key bloom: FP chance ~3e-4; seed is fixed
        assert not bloom.might_contain_any(sliced[j], h_out[0], h_out[1])
        off += rows
    assert bloom.build_sliced(keys, []) == []
