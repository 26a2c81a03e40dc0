"""Inference/TTA, submission formats, pseudo-labels, voting, conversion."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from speech_recognition_tpu.config import prepare_model_settings
from speech_recognition_tpu.infer.submission import (
    AUDIO_NAMES, read_uint8_memmap, write_submission_csvs,
    write_uint8_memmap,
)
from speech_recognition_tpu.infer.tta import Predictor, TTAConfig
from speech_recognition_tpu.labels import get_int2label
from speech_recognition_tpu.models import build_model
from speech_recognition_tpu.tools.convert import (
    convert_32_to_12, softmax,
)
from speech_recognition_tpu.tools.pseudo import (
    pseudo_by_agreement, read_submission_csv,
)
from speech_recognition_tpu.tools.vote import majority_vote


SETTINGS = prepare_model_settings(
    label_count=12, window_size_ms=30.0, window_stride_ms=10.0,
    dct_coefficient_count=80, num_log_mel_features=40,
    output_representation="mfcc")


def _predictor(tta=TTAConfig()):
    module, spec = build_model("conv_2d_fast", num_classes=12,
                               spectrogram_length=98,
                               num_log_mel_features=40)
    wav = jnp.zeros((2, 16000))
    pred = Predictor(module, SETTINGS, "mfcc", tta)
    x = pred.frontend.features(wav, "mfcc")
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    return pred, variables


def test_predictor_probs_sum_to_one():
    pred, variables = _predictor(TTAConfig(use_tta=False))
    wav = jnp.asarray(np.random.default_rng(0).uniform(
        -0.2, 0.2, (4, 16000)).astype(np.float32))
    probs = np.asarray(pred.predict(variables, wav))
    assert probs.shape == (4, 12)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)


def test_mesh_sharded_predictor_matches_single_device():
    """TTA inference over an 8-device mesh equals the unsharded result:
    the batch (and folded variant axis) shards, params replicate, XLA
    runs the sweep data-parallel."""
    from speech_recognition_tpu.parallel.mesh import make_mesh
    devices = jax.devices("cpu")
    mesh = make_mesh(devices[:8])
    module, spec = build_model("conv_2d_fast", num_classes=12,
                               spectrogram_length=98,
                               num_log_mel_features=40)
    plain = Predictor(module, SETTINGS, "mfcc", TTAConfig(use_tta=True))
    sharded = Predictor(module, SETTINGS, "mfcc", TTAConfig(use_tta=True),
                        mesh=mesh)
    wav = jnp.zeros((2, 16000))
    x = plain.frontend.features(wav, "mfcc")
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    batch = jnp.asarray(np.random.default_rng(4).uniform(
        -0.3, 0.3, (16, 16000)).astype(np.float32))
    p_plain = np.asarray(plain.predict(variables, batch))
    p_mesh = np.asarray(sharded.predict(variables, batch))
    np.testing.assert_allclose(p_mesh, p_plain, atol=1e-5)


def test_int16_input_matches_float32():
    """Packed int16 PCM decodes on device (1/32768) to the same probs as
    pre-scaled float32 input — the submission path ships int16 to halve
    host->device bytes."""
    pred, variables = _predictor(TTAConfig(use_tta=True))
    ints = np.random.default_rng(2).integers(
        -3000, 3000, (3, 16000)).astype(np.int16)
    p_i16 = np.asarray(pred.predict(variables, jnp.asarray(ints)))
    p_f32 = np.asarray(pred.predict(
        variables, jnp.asarray(ints.astype(np.float32) / 32768.0)))
    np.testing.assert_allclose(p_i16, p_f32, atol=1e-6)


def test_tta_is_mean_of_variants():
    tta = TTAConfig(use_tta=True)
    pred, variables = _predictor(tta)
    wav = jnp.asarray(np.random.default_rng(1).uniform(
        -0.2, 0.2, (3, 16000)).astype(np.float32))
    got = np.asarray(pred.predict(variables, wav))
    # manual average of the three variants (make_submission.py:142-144)
    p0 = np.asarray(pred._jit_probs(variables, wav))
    p1 = np.asarray(pred._jit_probs(variables,
                                    jnp.roll(wav, -1500, axis=1)))
    p2 = np.asarray(pred._jit_probs(variables, 1.2 * wav))
    np.testing.assert_allclose(got, (p0 + p1 + p2) / 3, atol=1e-5)


def test_submission_csvs_and_memmap(tmp_path):
    int2label = get_int2label(wanted_only=True)
    basenames = ["a.wav", "b.wav", "c.wav"]
    probs = np.zeros((3, 12), np.float32)
    probs[0, 0] = 1.0   # silence
    probs[1, 1] = 1.0   # unknown
    probs[2, 2] = 1.0   # stop
    paths = write_submission_csvs(str(tmp_path / "sub"), basenames, probs,
                                  int2label)
    fnames, labels = read_submission_csv(paths["wanted"])
    assert labels == ["silence", "unknown", "stop"]
    mm_path = str(tmp_path / "p.memmap")
    write_uint8_memmap(mm_path, probs)
    assert os.path.getsize(mm_path) == 36
    back = read_uint8_memmap(mm_path, 3, 12)
    assert back.argmax(-1).tolist() == [0, 1, 2]


def test_memmap_exchange_order_end_to_end(tmp_path):
    """Model-order probs must be reordered to AUDIO_NAMES before the
    uint8 memmap: the 12-class MODEL order is classes.py:7's
    'stop down off right up go on yes left no' while the exchange
    format is AUDIO_NAMES — only silence/unknown/'on' coincide.
    Regression for the round-3 integration bug where a 99.3%-accurate
    teacher produced 25.7%-accurate pseudo labels (every per-class
    count looked plausible; the labels were silently permuted)."""
    from speech_recognition_tpu.infer.submission import (
        AUDIO_NAMES, map_to_valid, to_audio_names_order,
    )
    from speech_recognition_tpu.tools.pseudo import pseudo_by_threshold

    int2label = get_int2label(wanted_only=True)
    n = len(int2label)
    # the model order is NOT the exchange order (the bug's premise)
    model_names = [map_to_valid(int2label[i]) for i in range(n)]
    assert model_names != AUDIO_NAMES
    assert sorted(model_names) == sorted(AUDIO_NAMES)
    # one confident clip per model class, in MODEL column order
    probs = np.full((n, n), 0.3 / (n - 1), np.float32)
    np.fill_diagonal(probs, 0.95)
    ex = to_audio_names_order(probs, int2label)
    for i in range(n):
        assert int(ex[i].argmax()) == AUDIO_NAMES.index(model_names[i])
    # through the memmap + threshold tool: each clip must land in the
    # directory of its TRUE label
    mm_path = str(tmp_path / "p.memmap")
    write_uint8_memmap(mm_path, ex)
    back = read_uint8_memmap(mm_path, n, n)
    from speech_recognition_tpu.data.wav import save_wav_file
    audio = tmp_path / "audio"
    audio.mkdir()
    fnames = []
    for i in range(n):
        fn = f"clip_{i}.wav"
        save_wav_file(str(audio / fn),
                      np.zeros(400, np.float32), 16000)
        fnames.append(fn)
    out = tmp_path / "pseudo"
    pseudo_by_threshold(fnames, back, str(audio), str(out),
                        prob_thresh=0.7)
    for i in range(n):
        name = model_names[i]
        if name == "silence":
            continue  # silence clips buffer into grouped background WAVs
        assert (out / name / f"clip_{i}.wav").exists(), name


def _write_sub(path, rows):
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["fname", "label"])
        w.writerows(rows)


def test_pseudo_by_agreement(tmp_path):
    audio = tmp_path / "audio"
    audio.mkdir()
    for fn in ("x.wav", "y.wav"):
        (audio / fn).write_bytes(b"RIFF0000WAVE")
    subs = []
    for i, labels in enumerate([("yes", "no"), ("yes", "go"),
                                ("yes", "no")]):
        p = str(tmp_path / f"s{i}.csv")
        _write_sub(p, [("x.wav", labels[0]), ("y.wav", labels[1])])
        subs.append(p)
    out = str(tmp_path / "pseudo")
    n = pseudo_by_agreement(subs, str(audio), out)
    assert n == 1  # only x.wav agrees 3-way
    assert os.path.exists(os.path.join(out, "yes", "x.wav"))


def test_majority_vote(tmp_path):
    subs = []
    votes = [("stop", "go"), ("stop", "no"), ("stop", "go"),
             ("down", "up"), ("stop", "yes")]
    for i, (a, b) in enumerate(votes):
        p = str(tmp_path / f"v{i}.csv")
        _write_sub(p, [("x.wav", a), ("y.wav", b)])
        subs.append(p)
    out = str(tmp_path / "vote.csv")
    clear, total = majority_vote(subs, out, min_count=3)
    assert total == 2 and clear == 1  # x clear (4x stop), y split
    fnames, labels = read_submission_csv(out)
    assert labels[0] == "stop"
    assert labels[1] == "go"  # tie-break: first (best) submission


def test_convert_32_to_12():
    from speech_recognition_tpu.labels import (
        get_classes, prepare_words_list)
    words = prepare_words_list(get_classes(wanted_only=False))
    assert len(words) == 32
    rng = np.random.default_rng(0)
    probs = softmax(rng.standard_normal((5, 32)).astype(np.float32))
    mapped = convert_32_to_12(probs)
    assert mapped.shape == (5, 12)
    np.testing.assert_allclose(mapped.sum(-1), 1.0, atol=1e-5)
    # a clip that is pure 'stop' maps to the stop column
    pure = np.zeros((1, 32), np.float32)
    pure[0, words.index("stop")] = 1.0
    m = convert_32_to_12(pure)
    assert AUDIO_NAMES[m.argmax()] == "stop"
    # a clip that is pure 'sheila' (not wanted) maps to unknown
    pure = np.zeros((1, 32), np.float32)
    pure[0, words.index("sheila")] = 1.0
    m = convert_32_to_12(pure)
    assert AUDIO_NAMES[m.argmax()] == "unknown"


def test_speed_tta_weighting():
    # make_submission.py:131-140: 6 variants summed / 10
    tta = TTAConfig(use_tta=True, use_speed_tta=True)
    pred, variables = _predictor(tta)
    rng = np.random.default_rng(2)
    wav = jnp.asarray(rng.uniform(-0.2, 0.2, (2, 16000)).astype(np.float32))
    slow = jnp.asarray(rng.uniform(-0.2, 0.2, (2, 16000)).astype(np.float32))
    got = np.asarray(pred.predict(variables, wav, slow))
    p = [np.asarray(pred._jit_probs(variables, v)) for v in (
        wav, jnp.roll(wav, -1500, axis=1), 1.2 * wav,
        slow, jnp.clip(1.1 * slow, -1.0, 1.0), 0.9 * slow)]
    want = sum(p) / 10.0
    np.testing.assert_allclose(got, want, atol=1e-5)
    # deliberately NOT a mean: rows sum to 6/10, reproducing the
    # reference's down-weighting
    np.testing.assert_allclose(got.sum(-1), 0.6, atol=1e-4)


def test_speed_tta_without_slow_falls_back():
    tta = TTAConfig(use_tta=True, use_speed_tta=True)
    pred, variables = _predictor(tta)
    wav = jnp.zeros((2, 16000))
    probs = np.asarray(pred.predict(variables, wav, None))
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
