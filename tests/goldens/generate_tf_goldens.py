"""Generate frontend parity goldens from TensorFlow itself.

The north-star requirement is float32-tolerance parity with the reference's
feature graph (reference input_data.py:361-381 uses ``tf.signal.stft`` ->
``linear_to_mel_weight_matrix`` -> ``mfccs_from_log_mel_spectrograms``;
reference audio.py:15-23 uses the legacy ``audio_spectrogram``+``mfcc`` C++
kernels; reference input_data.py:129 uses ``decode_wav``). This script runs
those *actual TF ops* on deterministic inputs and pins their outputs, so
the golden values provably do not come from our implementation.

Run manually to (re)generate ``tf_frontend_goldens.npz``:

    python tests/goldens/generate_tf_goldens.py

The checked-in .npz is what tests/test_tf_parity_goldens.py loads; that
test ALSO re-verifies live against TF when TF is importable.
"""

import os
import sys

import numpy as np


def make_waveforms() -> np.ndarray:
    """Deterministic [4, 16000] float32 test clips."""
    rng = np.random.default_rng(20260816)
    t = np.arange(16000) / 16000.0
    tones = (0.4 * np.sin(2 * np.pi * 440 * t)
             + 0.2 * np.sin(2 * np.pi * 1337 * t)
             + 0.01 * rng.standard_normal(16000))
    impulses = np.zeros(16000)
    impulses[::777] = 1.0
    impulses[100::1111] = -0.7
    noise = rng.uniform(-0.9, 0.9, 16000)
    chirp = 0.5 * np.sin(2 * np.pi * (200 * t + 1900 * t * t))
    return np.stack([tones, impulses, noise, chirp]).astype(np.float32)


def make_wav_bytes():
    """Three WAV byte strings covering pad / exact / multichannel-crop."""
    import struct

    def riff(int16_interleaved: np.ndarray, channels: int,
             sample_rate: int = 16000) -> bytes:
        raw = np.asarray(int16_interleaved, dtype="<i2").tobytes()
        hdr = b"RIFF" + struct.pack("<I", 36 + len(raw)) + b"WAVE"
        block = 2 * channels
        fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate,
                                    sample_rate * block, block, 16)
        return hdr + fmt + b"data" + struct.pack("<I", len(raw)) + raw

    rng = np.random.default_rng(7)
    short = rng.integers(-32768, 32768, size=7321, dtype=np.int64)
    exact = rng.integers(-32768, 32768, size=16000, dtype=np.int64)
    stereo = rng.integers(-32768, 32768, size=(20000, 2), dtype=np.int64)
    return {
        "wav_short": riff(short.astype(np.int16), 1),
        "wav_exact": riff(exact.astype(np.int16), 1),
        "wav_stereo": riff(stereo.astype(np.int16).reshape(-1), 2),
    }


GEOMETRIES = {
    # (frame_length, frame_step, n_mels, n_mfcc, lower_hz, upper_hz)
    "main": (480, 160, 80, 60, 80.0, 7600.0),   # train.py:31-39 recipe
    "alt": (400, 160, 40, 40, 80.0, 7600.0),    # 25ms window variant
}


def main():
    import tensorflow as tf

    out = {"waveforms": make_waveforms()}
    wav = tf.constant(out["waveforms"])

    for name, (frame_len, frame_step, n_mels, n_mfcc, lo, hi) in \
            GEOMETRIES.items():
        # The exact graph of reference input_data.py:361-381.
        stfts = tf.signal.stft(wav, frame_length=frame_len,
                               frame_step=frame_step, fft_length=None)
        spec = tf.abs(stfts)
        num_bins = spec.shape[-1]
        mel_matrix = tf.signal.linear_to_mel_weight_matrix(
            num_mel_bins=n_mels, num_spectrogram_bins=num_bins,
            sample_rate=16000, lower_edge_hertz=lo, upper_edge_hertz=hi)
        mel = tf.tensordot(spec, mel_matrix, 1)
        log_mel = tf.math.log(mel + 1e-6)
        mfcc = tf.signal.mfccs_from_log_mel_spectrograms(
            log_mel)[..., :n_mfcc]
        out[f"{name}_spec"] = spec.numpy()
        out[f"{name}_log_mel"] = log_mel.numpy()
        out[f"{name}_mfcc"] = mfcc.numpy()
        out[f"{name}_mel_matrix"] = mel_matrix.numpy()

    # Legacy C++ kernel pair (reference audio.py:15-23): audio_spectrogram
    # (magnitude_squared) + mfcc with dct_coefficient_count=40 and the op's
    # default filterbank (40 channels, 20-4000 Hz).
    from tensorflow.python.ops import gen_audio_ops
    legacy_spec = []
    legacy_mfcc = []
    for i in range(out["waveforms"].shape[0]):
        s = gen_audio_ops.audio_spectrogram(
            tf.constant(out["waveforms"][i][:, None]),
            window_size=480, stride=160, magnitude_squared=True)
        m = gen_audio_ops.mfcc(s, tf.constant(16000, tf.int32),
                               dct_coefficient_count=40)
        legacy_spec.append(s.numpy()[0])
        legacy_mfcc.append(m.numpy()[0])
    out["legacy_spec"] = np.stack(legacy_spec)
    out["legacy_mfcc"] = np.stack(legacy_mfcc)

    # decode_wav goldens (reference input_data.py:129,335-336 semantics).
    for key, data in make_wav_bytes().items():
        audio, sr = tf.audio.decode_wav(tf.constant(data),
                                        desired_channels=1,
                                        desired_samples=16000)
        out[f"{key}_decoded"] = audio.numpy()[:, 0]
        out[f"{key}_rate"] = np.int32(sr.numpy())
        out[f"{key}_bytes"] = np.frombuffer(data, dtype=np.uint8)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tf_frontend_goldens.npz")
    np.savez_compressed(path, **out)
    total = sum(v.nbytes for v in out.values())
    print(f"wrote {path} ({len(out)} arrays, {total/1e6:.1f} MB raw)")


if __name__ == "__main__":
    sys.exit(main())
