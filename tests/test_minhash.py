import numpy as np

from opentapioca_ray.functions.minhash import (
    band_keys,
    hamming64,
    hash64,
    jaccard,
    minhash_signature_fast,
    ngram_jaccard,
    shingle_hashes,
    shingles,
    simhash,
)


def test_hash64_deterministic():
    assert hash64("abc") == hash64("abc")
    assert hash64("abc") != hash64("abd")


def test_shingles():
    assert shingles(["a", "b", "c", "d"], 3) == ["a b c", "b c d"]
    assert shingles(["a"], 3) == ["a"]
    assert shingles([], 3) == []


def test_minhash_similarity_tracks_jaccard():
    toks_a = [f"t{i}" for i in range(100)]
    toks_b = toks_a[:90] + [f"x{i}" for i in range(10)]  # ~high overlap
    sa = minhash_signature_fast(shingle_hashes(toks_a, 3), 128)
    sb = minhash_signature_fast(shingle_hashes(toks_b, 3), 128)
    est = (sa == sb).mean()
    true = jaccard(set(shingles(toks_a, 3)), set(shingles(toks_b, 3)))
    assert abs(est - true) < 0.15
    # identical docs -> identical signatures
    assert (sa == minhash_signature_fast(shingle_hashes(list(toks_a), 3), 128)).all()


def test_band_keys_match_for_identical():
    sig = minhash_signature_fast(shingle_hashes(["a", "b", "c", "d", "e"], 3), 128)
    assert band_keys(sig, 16) == band_keys(sig.copy(), 16)
    assert len(band_keys(sig, 16)) == 16


def test_simhash_near_for_near_docs():
    toks_a = [f"t{i}" for i in range(200)]
    toks_b = toks_a[:195] + [f"z{i}" for i in range(5)]
    ha = simhash(shingle_hashes(toks_a, 3))
    hb = simhash(shingle_hashes(toks_b, 3))
    hc = simhash(shingle_hashes([f"q{i}" for i in range(200)], 3))
    assert hamming64(ha, hb) < hamming64(ha, hc)


def test_ngram_jaccard():
    assert ngram_jaccard(["a", "b", "c"], ["a", "b", "c"]) == 1.0
    assert ngram_jaccard(["a", "b", "c"], ["x", "y", "z"]) == 0.0
