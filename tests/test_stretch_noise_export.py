"""Phase-vocoder stretch, colored noise, AOT export."""

import numpy as np
import jax
import jax.numpy as jnp

from speech_recognition_tpu.data.noise import colored_noise
from speech_recognition_tpu.ops.stretch import (
    slow_variant_keep_tail, time_stretch,
)


def test_time_stretch_lengthens():
    t = np.linspace(0, 1, 16000, endpoint=False)
    tone = np.sin(2 * np.pi * 440 * t).astype(np.float32)[None, :]
    out = np.asarray(time_stretch(jnp.asarray(tone), rate=0.9))
    assert out.shape == (1, int(round(16000 / 0.9)))
    assert np.isfinite(out).all()
    # energy preserved roughly (tone continues through the stretch)
    mid = out[0, 2000:-2000]
    assert 0.3 < np.abs(mid).max() < 1.5


def test_time_stretch_preserves_pitch():
    # a stretched pure tone keeps its frequency: count zero crossings/sec
    sr = 16000
    t = np.linspace(0, 1, sr, endpoint=False)
    tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)[None, :]
    out = np.asarray(time_stretch(jnp.asarray(tone), rate=0.9))[0]
    seg = out[4000:12000]
    crossings = np.sum(np.abs(np.diff(np.signbit(seg))))
    freq = crossings / 2 / (len(seg) / sr)
    assert 200 < freq < 240


def test_slow_variant_keep_tail_shape():
    wav = jnp.zeros((3, 16000))
    out = slow_variant_keep_tail(wav, 0.9, 16000)
    assert out.shape == (3, 16000)


def test_colored_noise_spectra():
    rng = np.random.default_rng(0)
    n = 1 << 15
    for color, slope_sign in [("violet", 1), ("brown", -1)]:
        x = colored_noise(n, color, rng)
        assert abs(x.std() - 1.0) < 0.05
        spec = np.abs(np.fft.rfft(x)) ** 2
        freqs = np.fft.rfftfreq(n)
        lo = spec[(freqs > 0.001) & (freqs < 0.01)].mean()
        hi = spec[(freqs > 0.1) & (freqs < 0.4)].mean()
        if slope_sign > 0:
            assert hi > lo * 10
        else:
            assert lo > hi * 10


def test_colored_noise_unknown_color():
    import pytest
    with pytest.raises(ValueError):
        colored_noise(100, "plaid")


def test_export_roundtrip(tmp_path):
    from speech_recognition_tpu.config import prepare_model_settings
    from speech_recognition_tpu.export.aot import (
        export_inference, load_exported, save_exported,
    )
    from speech_recognition_tpu.models import build_model
    from speech_recognition_tpu.ops.frontend import Frontend

    settings = prepare_model_settings(
        label_count=12, dct_coefficient_count=80, num_log_mel_features=40,
        output_representation="mfcc")
    module, _ = build_model("conv_2d_fast", num_classes=12,
                            spectrogram_length=98, num_log_mel_features=40)
    frontend = Frontend(settings)
    wav = jnp.zeros((1, 16000))
    x = frontend.features(wav, "mfcc")
    variables = module.init({"params": jax.random.PRNGKey(0)}, x,
                            train=False)
    artifact = export_inference(module, frontend, "mfcc", variables,
                                batch_size=1)
    path = str(tmp_path / "frozen.jaxexport")
    save_exported(path, artifact)
    fn = load_exported(path)
    test_wav = jnp.asarray(np.random.default_rng(0).uniform(
        -0.1, 0.1, (1, 16000)).astype(np.float32))
    probs = np.asarray(fn(test_wav))
    assert probs.shape == (1, 12)
    np.testing.assert_allclose(probs.sum(), 1.0, atol=1e-5)
    # artifact output == live model output
    live = module.apply(variables, frontend.features(test_wav, "mfcc"),
                        train=False)
    np.testing.assert_allclose(probs, jax.nn.softmax(live, -1), atol=1e-5)


def test_map_32_to_12():
    from speech_recognition_tpu.export.aot import map_32_to_12_probs
    from speech_recognition_tpu.labels import (
        get_classes, prepare_words_list)
    words = prepare_words_list(get_classes(wanted_only=False))
    probs = np.full((1, 32), 0.001, np.float32)
    probs[0, words.index("down")] = 0.9
    mapped = np.asarray(map_32_to_12_probs(jnp.asarray(probs)))
    assert mapped.shape == (1, 12)
    # wanted-words order: _silence_, _unknown_, stop, down, ...
    assert mapped.argmax() == 3  # 'down'
    np.testing.assert_allclose(mapped.sum(), 1.0, atol=1e-5)
