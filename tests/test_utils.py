import numpy as np

from stract_tpu.utils.hashing import fnv1a64, prehash, splitmix64, term_hash, hash128
from stract_tpu.utils.bloom import U64BloomFilter, BytesBloomFilter
from stract_tpu.utils.hyperloglog import HyperLogLog, estimate_cardinalities
from stract_tpu.utils.simhash import simhash_text, hamming_distance, is_near_duplicate
from stract_tpu.utils.kahan import KahanSum
from stract_tpu.utils.naive_bayes import NaiveBayes


def test_fnv1a64_known_values():
    # standard FNV-1a test vectors
    assert fnv1a64(b"") == 0xCBF29CE484222325
    assert fnv1a64(b"a") == 0xAF63DC4C8601EC8C


def test_hash_stability():
    assert prehash("hello") == prehash("hello")
    assert prehash("hello") != prehash("hellp")
    assert term_hash(1, "x") != term_hash(2, "x")
    assert hash128("example.com") == hash128("example.com")
    assert splitmix64(0) != 0


def test_bloom_filter():
    f = U64BloomFilter(estimated_items=1000, fp_rate=0.01)
    keys = list(range(0, 10_000, 10))
    f.insert_many(keys)
    assert all(f.contains(k) for k in keys)
    fps = sum(f.contains(k) for k in range(1, 10_000, 10))
    assert fps < 100  # ~1% fp rate
    rt = U64BloomFilter.from_bytes(f.to_bytes())
    assert all(rt.contains(k) for k in keys)
    card = f.estimate_card()
    assert 700 < card < 1400


def test_bytes_bloom():
    f = BytesBloomFilter(estimated_items=100)
    f.insert_bytes(b"hello")
    assert f.contains_bytes(b"hello")
    assert not f.contains_bytes(b"world")


def test_hll_accuracy():
    h = HyperLogLog(precision=6)
    for i in range(10_000):
        h.add_u64(i * 2654435761 % (1 << 63))
    est = h.size()
    assert 0.6 * 10_000 < est < 1.4 * 10_000  # 64 registers → ~13% stderr


def test_hll_merge_equals_union():
    a, b = HyperLogLog(6), HyperLogLog(6)
    for i in range(1000):
        a.add_u64(i)
    for i in range(500, 1500):
        b.add_u64(i)
    u = HyperLogLog(6)
    for i in range(1500):
        u.add_u64(i)
    a.merge(b)
    assert np.array_equal(a.registers, u.registers)


def test_hll_vectorized_estimator_matches_scalar():
    hs = []
    for n in (10, 100, 1000):
        h = HyperLogLog(6)
        for i in range(n):
            h.add_u64(i * 7919)
        hs.append(h)
    regs = np.stack([h.registers for h in hs])
    vec = estimate_cardinalities(regs)
    for h, v in zip(hs, vec):
        assert abs(h.size() - v) < 1e-6


def test_simhash():
    a = simhash_text("the quick brown fox jumps over the lazy dog")
    b = simhash_text("the quick brown fox jumps over the lazy dog!")
    c = simhash_text("completely different content about pandas and bamboo sdlkfj")
    assert hamming_distance(a, b) <= 6
    assert hamming_distance(a, c) > 6
    assert is_near_duplicate(a, a)


def test_kahan():
    k = KahanSum()
    for _ in range(1_000_000):
        k.add(0.1)
    assert abs(k.value() - 100_000.0) < 1e-6


def test_naive_bayes():
    texts = ["nude adult explicit content xxx", "porn adult site nsfw", "cooking recipes for dinner",
             "python programming tutorial", "family friendly games", "adult explicit nsfw video"]
    labels = ["nsfw", "nsfw", "sfw", "sfw", "sfw", "nsfw"]
    m = NaiveBayes()
    m.fit(texts, labels)
    assert m.predict("explicit adult xxx content") == "nsfw"
    assert m.predict("python cooking tutorial") == "sfw"
    p = m.predict_proba("adult nsfw porn")
    assert p["nsfw"] > 0.5
