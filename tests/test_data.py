"""Data-pipeline tests: A3M parsing (native C++ + python fallback parity),
vocabulary, PDB round-trip."""

import numpy as np
import pytest

from rosettafold_tpu.data import a3m, pdb, vocab

A3M_TEXT = """>query
MKVLAT-GE
>hit1 some description
MKVlaLATSGE
>hit2
MKV-ATRGE
"""
# hit1: lowercase 'la' are insertions -> MKVLATSGE (9 cols, same as query)


@pytest.fixture
def a3m_file(tmp_path):
    f = tmp_path / "test.a3m"
    f.write_text(A3M_TEXT)
    return str(f)


def test_vocab_roundtrip():
    s = "ARNDCQEGHILKMFPSTWYV"
    toks = vocab.tokenize(s)
    assert list(toks) == list(range(20))
    assert vocab.detokenize(toks) == s
    assert vocab.tokenize("-X*")[0] == vocab.GAP


def test_a3m_python_parser(a3m_file):
    toks = a3m._parse_python(a3m_file, max_seqs=100)
    assert toks.shape == (3, 9)
    assert vocab.detokenize(toks[0]) == "MKVLAT-GE"
    assert vocab.detokenize(toks[1]) == "MKVLATSGE"  # insertions dropped
    assert vocab.detokenize(toks[2]) == "MKV-ATRGE"


def test_a3m_native_matches_python(a3m_file):
    t_py = a3m._parse_python(a3m_file, max_seqs=100)
    t_nat = a3m.load_a3m(a3m_file)
    if a3m._load_native() is None:
        pytest.skip("no g++ available")
    np.testing.assert_array_equal(t_py, t_nat)


def test_a3m_native_max_seqs(a3m_file):
    if a3m._load_native() is None:
        pytest.skip("no g++ available")
    t = a3m.load_a3m(a3m_file, max_seqs=2)
    assert t.shape == (2, 9)


def test_a3m_ragged_raises(tmp_path):
    f = tmp_path / "bad.a3m"
    f.write_text(">a\nMKV\n>b\nMKVL\n")
    with pytest.raises(ValueError):
        a3m.load_a3m(str(f))
    with pytest.raises(ValueError):
        a3m._parse_python(str(f), 10)


def test_msa_features_dedup_and_crop(a3m_file):
    toks = a3m.load_a3m(a3m_file)
    dup = np.concatenate([toks, toks[:1]], axis=0)  # duplicate the query
    msa, seq, aa_idx = a3m.msa_features(dup, n_seq=8, crop_len=5)
    assert msa.shape == (1, 3, 5)  # dedup removed the duplicate
    assert (msa[0, 0] == seq[0]).all()
    assert (aa_idx[0] == np.arange(5)).all()


def test_msa_features_subsample(a3m_file):
    """Inference-side subsampling: 'first' keeps alignment order (default,
    deterministic); 'diversity' keeps the query plus maximally distinct rows."""
    rng = np.random.default_rng(2)
    L = 12
    query = rng.integers(0, 20, L).astype(np.int8)
    clone = query.copy()
    clone[0] = (clone[0] + 1) % 20
    distinct = rng.integers(0, 20, (2, L)).astype(np.int8)
    # clones FIRST so alignment-order selection picks only them
    toks = np.concatenate([query[None], np.stack([clone] * 10), distinct])

    first, _, _ = a3m.msa_features(toks, n_seq=3, subsample="first")
    # dedup collapses the 10 identical clones to one -> rows are
    # query, clone, distinct[0] in alignment order
    assert (first[0, 0] == query).all() and (first[0, 1] == clone).all()

    div, _, _ = a3m.msa_features(toks, n_seq=3, subsample="diversity")
    assert (div[0, 0] == query).all()
    n_far = sum(any((row == d).all() for d in distinct) for row in div[0, 1:])
    assert n_far == 2, "diversity should pick both distinct homologs"

    with pytest.raises(ValueError, match="subsample"):
        a3m.msa_features(toks, n_seq=3, subsample="nope")


def test_pdb_write_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    L = 7
    xyz = rng.normal(size=(L, 3, 3)).astype(np.float32) * 5
    seq_tokens = rng.integers(0, 20, L)
    path = str(tmp_path / "out.pdb")
    pdb.write_pdb(path, xyz, seq_tokens, plddt=np.full(L, 0.5))
    xyz2, seq2 = pdb.read_pdb_backbone(path)
    assert xyz2.shape == (L, 3, 3)
    np.testing.assert_allclose(xyz2, xyz, atol=1e-3)  # PDB has 3 decimals
    assert seq2 == vocab.detokenize(seq_tokens)
