"""Differential tests executing the REFERENCE's ensemble/pseudo TOOLS.

Companion to test_reference_differential.py (data layer): here the
reference's run-once tool scripts — majority_vote.py, REPR_106_pseudo.py,
create_pseudo_with_thresh.py, convert_from_see_v3_bugfix.py — and
utils.py::tf_roll are executed VERBATIM (their sources are top-level
scripts, so they run via exec in a prepared temp cwd with the exact
hard-coded filenames they expect) and their outputs compared
artifact-by-artifact against this framework's tools on identical inputs.

Known, documented divergences asserted here instead of papered over:
  * WAV int16 encoding: the reference's pseudo-silence writer truncates
    (``np.int16(x * 32767)``, create_pseudo_with_thresh.py:57) while
    data/wav.py rounds-and-clips like tf.audio.encode_wav — samples may
    differ by 1 LSB, never more.
  * softmax: the reference's converter skips max-subtraction
    (convert_from_see_v3_bugfix.py:61-63); after the x255 uint8
    truncation this can flip isolated bytes by 1.
"""

import os
import shutil

import numpy as np
import pytest

REF = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available")

AUDIO_NAMES = ["silence", "unknown", "yes", "no", "up", "down",
               "left", "right", "on", "off", "stop", "go"]


def _exec_ref_script(name, cwd):
    """Execute a reference top-level script verbatim in ``cwd``."""
    src = open(os.path.join(REF, name)).read()
    old = os.getcwd()
    os.chdir(cwd)
    try:
        ns = {"__name__": "__ref_script__"}
        exec(compile(src, os.path.join(REF, name), "exec"), ns)
    finally:
        os.chdir(old)
    return ns


def _write_test_wavs(audio_dir, fnames, rng, samples=160, amp=9000):
    """Real int16 WAVs (scipy-written; read back by both sides)."""
    from scipy.io import wavfile as wf
    os.makedirs(audio_dir, exist_ok=True)
    for fn in fnames:
        data = rng.integers(-amp, amp, samples).astype(np.int16)
        wf.write(os.path.join(audio_dir, fn), 16000, data)


def _tree(root):
    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = p
    return out


def test_majority_vote_differential(tmp_path):
    """tools/vote.py vs the executed majority_vote.py on 400 rigged
    rows (clear majorities, 2-2-1 disputes, 5-way disagreements)."""
    import csv
    rng = np.random.default_rng(11)
    n = 400
    # fnames WITHOUT underscores so the reference's split_decision name
    # mangling ("counts_str" + "_" + fname) stays parseable
    fnames = [f"clip{i:05d}.wav" for i in range(n)]
    labels_per_sub = [[], [], [], [], []]
    for i in range(n):
        kind = i % 4
        picks = rng.choice(len(AUDIO_NAMES), size=5, replace=True)
        if kind == 0:      # unanimous
            picks[:] = picks[0]
        elif kind == 1:    # 3-2 split: clear at min_count=3
            picks[:3] = picks[0]
            picks[3:] = (picks[0] + 1) % 12
        elif kind == 2:    # 2-2-1: dispute -> best-PLB fallback
            picks[0] = picks[1]
            picks[2] = picks[3] = (picks[0] + 1) % 12
            picks[4] = (picks[0] + 2) % 12
        # kind == 3: random draws (may be anything)
        for s in range(5):
            labels_per_sub[s].append(AUDIO_NAMES[picks[s]])

    sub_fns = ["submission_106_tta_leftloud.csv",
               "submission_112_tta_silentloudleftleft.csv",
               "submission_173_tta_flsl.csv",
               "submission_143_tta_sllll.csv",
               "submission_091_leftsilentloud_tta.csv"]
    for s, sub_fn in enumerate(sub_fns):
        with open(tmp_path / sub_fn, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["fname", "label"])
            w.writerows(zip(fnames, labels_per_sub[s]))
    _write_test_wavs(tmp_path / "data" / "test" / "audio", fnames, rng)
    (tmp_path / "split_decision").mkdir()

    _exec_ref_script("majority_vote.py", tmp_path)

    from speech_recognition_tpu.tools.vote import majority_vote
    ours_csv = tmp_path / "ours.csv"
    ours_split = tmp_path / "ours_split"
    clear, total = majority_vote(
        [str(tmp_path / s) for s in sub_fns], str(ours_csv), min_count=3,
        test_audio_dir=str(tmp_path / "data" / "test" / "audio"),
        split_decision_dir=str(ours_split))
    assert total == n

    def read(p):
        with open(p, newline="") as f:
            return [(r["fname"], r["label"]) for r in csv.DictReader(f)]

    assert read(ours_csv) == read(tmp_path / "majority_sub_034.csv")

    # disputed sets match (names mangle differently; recover the
    # original fname as the suffix after the last underscore)
    def disputed(d):
        return {f.rsplit("_", 1)[-1] for f in os.listdir(d)}

    assert disputed(ours_split) == disputed(tmp_path / "split_decision")
    assert clear == n - len(disputed(ours_split))


def test_pseudo_agreement_differential(tmp_path):
    """tools/pseudo.py::pseudo_by_agreement vs the executed
    REPR_106_pseudo.py: identical pseudo-label trees, byte-identical
    copies."""
    import csv
    rng = np.random.default_rng(12)
    n = 300
    fnames = [f"c{i:05d}.wav" for i in range(n)]
    label_pool = AUDIO_NAMES + ["cat", "tree", "bed"]
    subs = [[], [], []]
    for i in range(n):
        base = label_pool[int(rng.integers(len(label_pool)))]
        agree = rng.random() < 0.6
        for s in range(3):
            subs[s].append(base if agree or s == 0
                           else label_pool[int(rng.integers(
                               len(label_pool)))])
    sub_fns = ["submission_098_leftloud_tta_all_labels.csv",
               "submission_096_leftloud_tta_all_labels.csv",
               "submission_091_leftloud_tta_all_labels.csv"]
    for s, sub_fn in enumerate(sub_fns):
        with open(tmp_path / sub_fn, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["fname", "label"])
            w.writerows(zip(fnames, subs[s]))
    _write_test_wavs(tmp_path / "data" / "test" / "audio", fnames, rng)

    _exec_ref_script("REPR_106_pseudo.py", tmp_path)

    from speech_recognition_tpu.tools.pseudo import pseudo_by_agreement
    ours_dir = tmp_path / "ours"
    count = pseudo_by_agreement(
        [str(tmp_path / s) for s in sub_fns],
        str(tmp_path / "data" / "test" / "audio"), str(ours_dir))

    ref_tree = _tree(tmp_path / "data" / "pseudo" / "audio")
    our_tree = _tree(ours_dir)
    assert set(our_tree) == set(ref_tree)
    assert count == len(ref_tree) > 50
    for rel in our_tree:
        assert (open(our_tree[rel], "rb").read()
                == open(ref_tree[rel], "rb").read()), rel


def test_pseudo_threshold_differential(tmp_path):
    """tools/pseudo.py::pseudo_by_threshold vs the executed
    create_pseudo_with_thresh.py at the script's hard-coded memmap
    scale (158538 x 12): identical trees, byte-identical word copies,
    silence concatenations within the documented 1-LSB encode delta."""
    import csv
    from scipy.io import wavfile as wf

    rng = np.random.default_rng(13)
    n = 3000  # CSV rows (the script loops over the CSV, not the memmap)
    fnames = [f"t{i:05d}.wav" for i in range(n)]
    with open(tmp_path / "submission_50.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fname", "label"])
        w.writerows((fn, "unknown") for fn in fnames)

    # full-size exchange memmap, exactly as the script opens it (r+)
    probs = np.memmap(tmp_path / "submit_50_probs.uint8.memmap",
                      dtype="uint8", mode="w+", shape=(158538, 12))
    probs[:] = rng.integers(0, 120, probs.shape, dtype=np.uint8)
    silence_hits = 0
    for i in range(n):
        kind = i % 5
        if kind == 0 and silence_hits < 65:
            # above-threshold silence: 2 full groups of 30 + 5 leftover
            probs[i, 0] = int(rng.integers(185, 256))
            silence_hits += 1
        elif kind == 1:
            probs[i, 1 + int(rng.integers(11))] = int(
                rng.integers(185, 256))
        elif kind == 2:
            # just under threshold (178/255 = 0.698)
            probs[i] = 0
            probs[i, int(rng.integers(12))] = 178
        # kinds 3-4: low-prob noise rows
    probs.flush()
    del probs
    _write_test_wavs(tmp_path / "data" / "test" / "audio", fnames, rng,
                     samples=320, amp=9000)  # amp/0.35 stays in int16

    ns = _exec_ref_script("create_pseudo_with_thresh.py", tmp_path)

    from speech_recognition_tpu.infer.submission import read_uint8_memmap
    from speech_recognition_tpu.tools.pseudo import pseudo_by_threshold
    ours_dir = tmp_path / "ours"
    stats = pseudo_by_threshold(
        fnames,
        read_uint8_memmap(str(tmp_path / "submit_50_probs.uint8.memmap"),
                          num_rows=158538)[:n],
        str(tmp_path / "data" / "test" / "audio"), str(ours_dir))

    assert stats["created"] == ns["num_labels"]
    assert stats["low_prob"] == ns["num_small_prob"]

    ref_tree = _tree(tmp_path / "data" / "heng_pseudo")
    our_tree = _tree(ours_dir)
    assert set(our_tree) == set(ref_tree)
    # both concat files present, leftover (<30) silence clips dropped
    concats = [p for p in our_tree if "custom_silence" in p]
    assert len(concats) == 2
    for rel in our_tree:
        if rel in concats:
            _, ref_data = wf.read(ref_tree[rel])
            _, our_data = wf.read(our_tree[rel])
            assert ref_data.shape == our_data.shape
            assert np.abs(ref_data.astype(np.int32)
                          - our_data.astype(np.int32)).max() <= 1
        else:
            assert (open(our_tree[rel], "rb").read()
                    == open(ref_tree[rel], "rb").read()), rel
    # directory skeleton (labels seen pre-threshold) matches too
    assert ({os.path.relpath(d, ours_dir) for d, _, _ in
             os.walk(ours_dir)} ==
            {os.path.relpath(d, tmp_path / "data" / "heng_pseudo")
             for d, _, _ in os.walk(tmp_path / "data" / "heng_pseudo")})


@pytest.mark.slow
def test_convert_32_to_12_full_scale_differential(tmp_path):
    """tools/convert.py vs the executed convert_from_see_v3_bugfix.py at
    the script's hard-coded 158538-clip scale: same uint8 memmap up to
    the documented 1-LSB softmax-formulation delta."""
    pd = pytest.importorskip("pandas")
    from speech_recognition_tpu.labels import get_classes, prepare_words_list

    names = prepare_words_list(get_classes(wanted_only=False))
    n = 158538
    rng = np.random.default_rng(14)
    raw = rng.random((n, len(names)), dtype=np.float32)
    raw /= raw.sum(axis=1, keepdims=True)
    df = pd.DataFrame(raw, columns=names)
    df.insert(0, "fname", [f"clip_{i:06d}.wav" for i in range(n)])
    df.insert(1, "label", "unknown")
    csv_path = tmp_path / \
        "REPR_submission_106_tta_leftloud_all_labels_probs.csv"
    df.to_csv(csv_path, index=False, float_format="%.7f")

    _exec_ref_script("convert_from_see_v3_bugfix.py", tmp_path)
    ref_mm = np.memmap(
        tmp_path / "submission_106_tta_leftloud_all_labels_probs"
                   ".uint8.memmap",
        dtype="uint8", mode="r", shape=(n, 12))

    from speech_recognition_tpu.tools.convert import (
        convert_probs_csv_to_memmap,
    )
    our_path = tmp_path / "ours.memmap"
    out_fnames, _ = convert_probs_csv_to_memmap(str(csv_path),
                                                str(our_path))
    our_mm = np.memmap(our_path, dtype="uint8", mode="r", shape=(n, 12))

    assert out_fnames[:3] == ["clip_000000.wav", "clip_000001.wav",
                              "clip_000002.wav"]
    diff = np.abs(ref_mm.astype(np.int16) - our_mm.astype(np.int16))
    assert diff.max() <= 1
    assert (diff == 0).mean() > 0.999


def test_augment_draw_policy_differential():
    """Two-sample distribution check: the reference's EXECUTED per-sample
    draw policy (input_data.py:457-514, run with a recording fake sess
    and seeded np.random) vs ops/augment.py's vectorized jax draws.

    This is stronger than the spec-based distribution tests in
    test_augment.py: a misreading of the reference's policy (gate
    ordering, the silence 0.9 quirk, inclusive shift bounds) would make
    both our code and our spec-test wrong together, but cannot fool a
    comparison against the reference's own executed draws."""
    import jax
    import jax.numpy as jnp
    from speech_recognition_tpu.config import AugmentConfig
    from speech_recognition_tpu.ops.augment import (
        draw_augment_params, draw_volumes,
    )

    src = open(os.path.join(REF, "input_data.py")).read()
    s = src.index("  def get_data(")
    method = src[s:src.index("\n  def get_unprocessed_data", s)]
    ns = {"np": np, "xrange": range, "SILENCE_LABEL": "_silence_"}
    exec("\n".join(l[2:] if l.startswith("  ") else l
                   for l in method.splitlines()), ns)

    desired = 2000
    records = []

    class _Sess:
        def run(self, fetch, feed_dict):
            records.append({"shift": feed_dict["shift"],
                            "bgv": feed_dict["bgv"],
                            "fgv": feed_dict["fgv"],
                            "silence": feed_dict["fn"] == "sil.wav"})
            return np.zeros(desired)

    class Shim:
        pass

    shim = Shim()
    shim.model_settings = {"desired_samples": desired, "label_count": 12}
    shim.output_representation = "raw"
    n_cand, n_sil = 512, 64  # 12.5% silence
    shim.data_index = {
        "training": ([{"label": "_silence_", "file": "sil.wav"}] * n_sil
                     + [{"label": "yes", "file": "word.wav"}]
                     * (n_cand - n_sil)),
        "pseudo": [{"label": "no", "file": "pseudo.wav"}] * 8,
    }
    shim.background_data = [np.zeros(6000), np.zeros(8000)]
    shim.wav_filename_placeholder_ = "fn"
    shim.time_shift_placeholder_ = "shift"
    shim.background_data_placeholder_ = "bg"
    shim.background_volume_placeholder_ = "bgv"
    shim.foreground_volume_placeholder_ = "fgv"
    shim.background_clamp_ = "out"
    shim.word_to_index = {"_silence_": 0, "_unknown_": 1, "yes": 2,
                          "no": 3}

    np.random.seed(123)
    sess = _Sess()
    for _ in range(40):
        ns["get_data"].__get__(shim)(
            n_cand, 0, 0.3, 0.15, 0.3, 0.15, 0.3, [-500, 0],
            "training", sess, pseudo_frequency=0.0, flip_frequency=0.25,
            silence_volume_range=0.3)
    ref_shift = np.array([r["shift"] for r in records], np.int64)
    ref_bgv = np.array([r["bgv"] for r in records], np.float64)
    ref_fgv = np.array([r["fgv"] for r in records], np.float64)
    ref_sil = np.array([r["silence"] for r in records], bool)

    n = len(records)
    cfg = AugmentConfig(flip_frequency=0.25)
    is_sil = jnp.arange(n) < int(ref_sil.sum())
    shift, _, _, _ = draw_augment_params(
        jax.random.PRNGKey(7), is_sil, cfg, background=None,
        batch=n, num_samples=desired)
    fgv, bgv = draw_volumes(jax.random.PRNGKey(8), is_sil, cfg, n,
                            use_background=True)
    our_shift = np.asarray(shift, np.int64)
    our_fgv = np.asarray(fgv, np.float64)
    our_bgv = np.asarray(bgv, np.float64)
    our_sil = np.asarray(is_sil)

    def close(a, b, tol):
        assert abs(a - b) < tol, (a, b, tol)

    # time shift: gate probability, support, conditional mean
    close((ref_shift == 0).mean(), (our_shift == 0).mean(), 0.02)
    for nz in (ref_shift[ref_shift != 0], our_shift[our_shift != 0]):
        assert nz.min() >= -500 and nz.max() <= -1
        assert nz.min() < -480 and nz.max() > -20
    close(ref_shift[ref_shift != 0].mean(),
          our_shift[our_shift != 0].mean(), 12.0)

    # foreground volume, non-silence: P(untouched), flip rate, support
    rf, of = ref_fgv[~ref_sil], our_fgv[~our_sil]
    close((np.abs(rf) == 1.0).mean(), (np.abs(of) == 1.0).mean(), 0.02)
    close((rf < 0).mean(), (of < 0).mean(), 0.02)
    close(np.abs(rf).mean(), np.abs(of).mean(), 0.005)
    for v in (np.abs(rf), np.abs(of)):
        assert v.min() >= 0.85 - 1e-9 and v.max() <= 1.15 + 1e-9

    # silence is always muted in the foreground
    assert (ref_fgv[ref_sil] == 0).all() and (our_fgv[our_sil] == 0).all()

    # background volume, silence rows: the 0.9 quirk produces a
    # three-way mixture — P(zero) = (1-bf)*0.1, and only quirk draws
    # can exceed background_volume_range
    rs, os_ = ref_bgv[ref_sil], our_bgv[our_sil]
    close((rs == 0).mean(), (os_ == 0).mean(), 0.03)
    close((rs > 0.15).mean(), (os_ > 0.15).mean(), 0.03)
    close(rs.mean(), os_.mean(), 0.01)
    assert rs.max() <= 0.3 and os_.max() <= 0.3

    # background volume, non-silence rows: Bernoulli(bf) x U(0, bvr)
    rn, on = ref_bgv[~ref_sil], our_bgv[~our_sil]
    close((rn == 0).mean(), (on == 0).mean(), 0.02)
    close(rn[rn > 0].mean(), on[on > 0].mean(), 0.005)
    assert rn.max() <= 0.15 and on.max() <= 0.15


def test_data_gen_cycle_differential():
    """compat.data_gen vs the reference's executed data_gen
    (utils.py:6-53): identical get_data kwargs sequences, including the
    non-training knob neutralization and the offset reset boundary
    (``offset > set_size - batch_size``, utils.py:39)."""
    from speech_recognition_tpu import compat

    src = open(os.path.join(REF, "utils.py")).read()
    s = src.index("def data_gen(")
    ns = {}
    exec(src[s:src.index("\ndef ", s + 5)], ns)
    ref_data_gen = ns["data_gen"]

    def make_recorder(rec):
        class P:
            @staticmethod
            def get_data(**kw):
                kw.pop("sess", None)
                kw["time_shift_range"] = tuple(kw["time_shift_range"])
                rec.append(dict(kw))
                return kw["offset"], 0

            @staticmethod
            def set_size(mode):
                return 1000

        return P()

    for mode in ("validation", "training"):
        ref_rec, our_rec = [], []
        ref_gen = ref_data_gen(make_recorder(ref_rec), sess=None,
                               batch_size=128, mode=mode,
                               pseudo_frequency=0.6, flip_frequency=0.1)
        our_gen = compat.data_gen(make_recorder(our_rec), sess=None,
                                  batch_size=128, mode=mode,
                                  pseudo_frequency=0.6,
                                  flip_frequency=0.1)
        for _ in range(25):  # crosses the epoch reset three times
            next(ref_gen)
            next(our_gen)
        assert our_rec == ref_rec, mode


def test_tf_roll_differential():
    """ops/augment.py::roll_batch vs the reference's executed tf_roll
    (utils.py:56-73) — the reference's own TODO test
    (input_data.py:345), run against its actual graph code."""
    tf = pytest.importorskip("tensorflow")
    tfv1 = tf.compat.v1
    import jax.numpy as jnp
    from speech_recognition_tpu.ops.augment import roll_batch

    src = open(os.path.join(REF, "utils.py")).read()
    s = src.index("def tf_roll(")
    ns = {"tf": tf}
    exec(src[s:src.index("\ndef ", s + 5)], ns)
    tf_roll = ns["tf_roll"]

    rng = np.random.default_rng(2)
    a_len = 160
    wav = rng.standard_normal((7, a_len)).astype(np.float32)
    shifts = np.array([0, 1, -1, 59, -59, a_len, -a_len], np.int32)
    with tfv1.Graph().as_default():
        a_ph = tfv1.placeholder(tf.float32, (a_len, 1))
        s_ph = tfv1.placeholder(tf.int32, ())
        rolled = tf_roll(a_ph, s_ph, a_len=a_len)
        with tfv1.Session() as sess:
            ref = np.stack([
                sess.run(rolled, {a_ph: wav[i][:, None],
                                  s_ph: shifts[i]})[:, 0]
                for i in range(len(shifts))])
    ours = np.asarray(roll_batch(jnp.asarray(wav), jnp.asarray(shifts)))
    np.testing.assert_array_equal(ours, ref)
