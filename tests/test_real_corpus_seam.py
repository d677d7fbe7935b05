"""Real-corpus drop-in seam (VERDICT r3 item 4).

The committed train files are synthetic stand-ins (the reference's own
``style.train.{0,1}`` are absent from both mounts); these tests pin the
CONTRACT that real corpora flow through unchanged once provided: reference
file format (one sentence per line, label = filename suffix,
``src/loader.py:10-40``), real-text shape (ragged lengths beyond max_len,
punctuation/apostrophes, unseen vocabulary), and the one-command rehearsal
path (``tools/dress_rehearsal.py --real-data``).
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# real-shaped text: ragged lengths (3..40 words), punctuation, contractions,
# numerals — the failure modes a synthetic fixed-shape corpus never exercises
NEG = [
    "the service was awful , and honestly i wouldn't come back .",
    "terrible !",
    "my burger arrived cold ; the fries were soggy and over-salted , the "
    "waiter ignored us for 45 minutes , and when the check finally came "
    "they'd added a 20 % tip for a party of two — never , ever again .",
    "don't waste your money here .",
    "worst pad thai i've had in years .",
]
POS = [
    "absolutely loved the tasting menu — every course was a delight !",
    "great coffee .",
    "the staff remembered my kid's name , the patio was spotless , and the "
    "happy-hour oysters at $ 1.50 a piece are the best deal in town ; we've "
    "been back three saturdays in a row and it keeps getting better .",
    "can't recommend this bakery enough .",
    "10/10 would visit again , the chef's specials never disappoint .",
]


@pytest.fixture
def real_dir(tmp_path):
    ds = tmp_path / "data" / "yelp"
    ds.mkdir(parents=True)
    for name, lines in (("style.train.0", NEG), ("style.train.1", POS)):
        # repeat so BPE/w2v have something to chew on; keep ragged order
        (ds / name).write_text("\n".join(lines * 40) + "\n")
    return ds


def test_validate_style_file_contract(real_dir, tmp_path):
    from consistent__style_transfer_tpu.data.corpus import validate_style_file

    stats = validate_style_file(str(real_dir / "style.train.0"))
    assert stats["label"] == 0 and stats["n_lines"] == 200
    assert stats["max_words"] >= 40  # the long review survived intact

    # contract violations fail loudly, not at train time
    with pytest.raises(ValueError, match="missing"):
        validate_style_file(str(real_dir / "style.train.9"))
    bad = tmp_path / "style.train.pos"
    bad.write_text("hello\n")
    with pytest.raises(ValueError, match="style id"):
        validate_style_file(str(bad))
    empty = tmp_path / "style.train.0"
    empty.write_text("\n\n")
    with pytest.raises(ValueError, match="empty"):
        validate_style_file(str(empty))


def test_real_text_flows_to_static_arrays(real_dir, tmp_path):
    """Tokenizer trained ON the real text; ragged real sentences become the
    same fixed-shape (N, max_len) arrays and static optimize batches the
    synthetic corpus produces — vocab growth and truncation included."""
    from consistent__style_transfer_tpu.data.corpus import StyleCorpus
    from consistent__style_transfer_tpu.data.pipeline import make_batches
    from consistent__style_transfer_tpu.text.bpe import BPETokenizer

    files = [str(real_dir / f"style.train.{s}") for s in (0, 1)]
    tok = BPETokenizer.train(files, vocab_size=500)
    assert len(tok) > 50  # real punctuation/contractions grew the vocab

    max_len = 18
    corpus = StyleCorpus.from_files(files, tok, max_len)
    assert corpus.ids.shape == (400, max_len)
    assert corpus.ids.dtype == np.int32
    assert corpus.lengths.max() == max_len  # 60+-word review truncated
    assert corpus.lengths.min() >= 1
    assert set(np.unique(corpus.labels)) == {0, 1}

    batches = list(make_batches(corpus, batch_size=64, max_len=max_len,
                                stage="optimize", shuffle=True, seed=0))
    assert all(b["x"].shape == (64, max_len) for b in batches)  # static shapes
    # inference path (shuffle=False) pads the last partial batch instead of
    # dropping rows: every real sentence reaches the .tsf output
    infer = list(make_batches(corpus, batch_size=64, max_len=max_len,
                              stage="optimize", shuffle=False, seed=0))
    assert sum(b.valid for b in infer) == 400
    assert all(b["x"].shape == (64, max_len) for b in infer)


def test_round_trip_text_survives(real_dir):
    """Decode(encode(real sentence)) reproduces the text the eval harness
    will read back from ``.tsf`` files, modulo the same pre-tokenization
    the reference's CharBPETokenizer applies (punctuation split off as its
    own tokens — "wouldn't" -> "wouldn ' t"; reference src/vocab.py:14-34).
    Round-tripping the round-trip must then be EXACTLY stable."""
    from consistent__style_transfer_tpu.text.bpe import BPETokenizer, pre_tokenize

    files = [str(real_dir / f"style.train.{s}") for s in (0, 1)]
    tok = BPETokenizer.train(files, vocab_size=500)
    for s in NEG + POS:
        once = tok.decode(tok.encode(s))
        assert once == " ".join(pre_tokenize(s))  # only pre-tok normalization
        assert tok.decode(tok.encode(once)) == once  # fixpoint: .tsf-safe


@pytest.mark.slow
def test_dress_rehearsal_real_data_one_command(real_dir, tmp_path):
    """The documented drop-in path: put style.train.{0,1} under
    <base>/data/<ds>/, run ``dress_rehearsal --real-data`` — the corpus is
    validated (never overwritten by synthesis) and the vocab builds from the
    REAL text. ``--stop-after vocab`` keeps the test off the training path
    (covered by the synthetic rehearsals)."""
    base = str(real_dir.parent.parent)  # tmp_path: data/yelp lives beneath
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dress_rehearsal.py"),
         "--base", base, "--real-data", "--stop-after", "vocab"],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=600)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]
    assert "real corpus validated" in r.stdout
    rec = json.load(open(os.path.join(base, "rehearsal.json")))
    assert rec["stages"]["corpus"]["real"] is True
    assert rec["stages"]["corpus"]["train_lines"] == 400
    assert rec["stages"]["vocab"]["vocab"] > 50
    # the original user files are untouched
    assert open(real_dir / "style.train.0").read().startswith(NEG[0])
    meta = json.load(open(real_dir / "corpus_meta.json"))
    assert meta == {"real": True}

    # missing corpus -> actionable failure, nothing synthesized in its place
    base2 = str(tmp_path / "empty_base")
    r2 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dress_rehearsal.py"),
         "--base", base2, "--real-data", "--stop-after", "corpus"],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=120)
    assert r2.returncode != 0
    assert "drop the real corpus" in (r2.stdout + r2.stderr)
    assert not os.path.exists(os.path.join(base2, "data", "yelp",
                                           "style.train.0"))

    # a synthetic corpus left in the base must NOT be relabeled real: the
    # files pass format validation, so only the meta can tell — refuse
    base3 = str(tmp_path / "stale_synth")
    ds3 = os.path.join(base3, "data", "yelp")
    os.makedirs(ds3)
    for s in (0, 1):
        with open(os.path.join(ds3, f"style.train.{s}"), "w") as f:
            f.write("synthetic stand-in line\n" * 10)
    with open(os.path.join(ds3, "corpus_meta.json"), "w") as f:
        json.dump({"mult": 135, "recombine": 0.0}, f)
    r3 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dress_rehearsal.py"),
         "--base", base3, "--real-data", "--stop-after", "corpus"],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=120)
    assert r3.returncode != 0
    assert "synthetic corpus" in (r3.stdout + r3.stderr)
    meta3 = json.load(open(os.path.join(ds3, "corpus_meta.json")))
    assert "real" not in meta3  # meta untouched by the refused run

    # a pre-meta corpus is adopted only under DEFAULT generation params:
    # a non-default request must refuse instead of relabeling it
    base4 = str(tmp_path / "premeta")
    ds4 = os.path.join(base4, "data", "yelp")
    os.makedirs(ds4)
    for s in (0, 1):
        with open(os.path.join(ds4, f"style.train.{s}"), "w") as f:
            f.write("pre meta corpus line\n" * 10)
    r4 = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "dress_rehearsal.py"),
         "--base", base4, "--mult", "50", "--stop-after", "corpus"],
        capture_output=True, text=True, env=env, cwd=ROOT, timeout=120)
    assert r4.returncode != 0
    assert "unknown parameters" in (r4.stdout + r4.stderr)
    assert not os.path.exists(os.path.join(ds4, "corpus_meta.json"))
