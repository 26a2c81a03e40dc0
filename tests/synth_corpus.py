"""Synthetic 12-class Speech-Commands-shaped corpus for training tests.

Each of the 10 wanted words gets a distinct spectral signature (tone /
chirp / AM tone), two extra words provide the `_unknown_` pool, and
`_background_noise_` supplies silence/background material — the full
label space of the reference task (classes.py:5-9) without real data.
Deliberately non-trivial: per-clip random phase, amplitude, onset
timing, and additive noise.
"""

import numpy as np

from speech_recognition_tpu.data.wav import save_wav_file

WANTED = ["yes", "no", "up", "down", "left", "right", "on", "off",
          "stop", "go"]
UNKNOWN_WORDS = ["cat", "bed"]
SR = 16000


def _word_signal(word_idx: int, rng: np.random.Generator) -> np.ndarray:
    t = np.arange(SR) / SR
    base = 320.0 * (1.31 ** word_idx)      # 320 Hz ... ~3.6 kHz
    phase = rng.uniform(0, 2 * np.pi)
    amp = rng.uniform(0.25, 0.7)
    kind = word_idx % 3
    if kind == 0:                           # steady tone + 2nd harmonic
        sig = np.sin(2 * np.pi * base * t + phase) \
            + 0.3 * np.sin(2 * np.pi * 2 * base * t)
    elif kind == 1:                         # upward chirp
        sig = np.sin(2 * np.pi * (base * t + 0.35 * base * t * t) + phase)
    else:                                   # amplitude-modulated tone
        sig = np.sin(2 * np.pi * base * t + phase) \
            * (0.6 + 0.4 * np.sin(2 * np.pi * 7.0 * t))
    # random onset/offset envelope (word somewhere inside the second)
    onset = rng.integers(0, SR // 4)
    length = rng.integers(SR // 2, SR - onset)
    env = np.zeros(SR)
    ramp = 400
    env[onset:onset + length] = 1.0
    env[onset:onset + ramp] = np.linspace(0, 1, ramp)
    env[onset + length - ramp:onset + length] = np.linspace(1, 0, ramp)
    sig = amp * sig * env
    sig += rng.normal(0, 0.01, SR)
    return np.clip(sig, -1.0, 1.0).astype(np.float32)


def _word_signal_n(word_idx: int, num_words: int,
                   rng: np.random.Generator) -> np.ndarray:
    """Like _word_signal but with log-spaced bases that stay under
    Nyquist for any vocabulary size (the 32-class recipe needs 30)."""
    t = np.arange(SR) / SR
    frac = word_idx / max(num_words - 1, 1)
    base = 240.0 * (3400.0 / 240.0) ** frac
    phase = rng.uniform(0, 2 * np.pi)
    amp = rng.uniform(0.25, 0.7)
    kind = word_idx % 3
    if kind == 0:
        sig = np.sin(2 * np.pi * base * t + phase) \
            + 0.3 * np.sin(2 * np.pi * 2 * base * t)
    elif kind == 1:
        sig = np.sin(2 * np.pi * (base * t + 0.35 * base * t * t) + phase)
    else:
        sig = np.sin(2 * np.pi * base * t + phase) \
            * (0.6 + 0.4 * np.sin(2 * np.pi * 7.0 * t))
    onset = rng.integers(0, SR // 4)
    length = rng.integers(SR // 2, SR - onset)
    env = np.zeros(SR)
    ramp = 400
    env[onset:onset + length] = 1.0
    env[onset:onset + ramp] = np.linspace(0, 1, ramp)
    env[onset + length - ramp:onset + length] = np.linspace(1, 0, ramp)
    sig = amp * sig * env
    sig += rng.normal(0, 0.01, SR)
    return np.clip(sig, -1.0, 1.0).astype(np.float32)


def build_corpus_words(root, words, clips_per_word: int = 40,
                       seed: int = 0) -> None:
    """Arbitrary-vocabulary corpus (e.g. the 30 known words of the
    32-class recipe, classes.py:12-17) + background noise."""
    rng = np.random.default_rng(seed)
    for w_i, word in enumerate(words):
        d = root / word
        d.mkdir(parents=True, exist_ok=True)
        for i in range(clips_per_word):
            save_wav_file(str(d / f"spk{i:03d}_nohash_0.wav"),
                          _word_signal_n(w_i, len(words), rng), SR)
    bg = root / "_background_noise_"
    bg.mkdir(exist_ok=True)
    save_wav_file(str(bg / "white_noise.wav"),
                  rng.normal(0, 0.08, SR * 10).astype(np.float32), SR)
    t = np.arange(SR * 10) / SR
    rumble = 0.1 * np.sin(2 * np.pi * 60 * t) \
        + rng.normal(0, 0.03, SR * 10)
    save_wav_file(str(bg / "rumble.wav"), rumble.astype(np.float32), SR)


def build_corpus(root, clips_per_word: int = 40, seed: int = 0) -> None:
    """Write WAVs under ``root/<word>/spkNNN_nohash_0.wav`` + noise."""
    rng = np.random.default_rng(seed)
    words = WANTED + UNKNOWN_WORDS
    for w_i, word in enumerate(words):
        d = root / word
        d.mkdir(parents=True, exist_ok=True)
        for i in range(clips_per_word):
            save_wav_file(str(d / f"spk{i:03d}_nohash_0.wav"),
                          _word_signal(w_i, rng), SR)
    bg = root / "_background_noise_"
    bg.mkdir(exist_ok=True)
    save_wav_file(str(bg / "white_noise.wav"),
                  rng.normal(0, 0.08, SR * 10).astype(np.float32), SR)
    # low-frequency rumble, a second flavour of background
    t = np.arange(SR * 10) / SR
    rumble = 0.1 * np.sin(2 * np.pi * 60 * t) \
        + rng.normal(0, 0.03, SR * 10)
    save_wav_file(str(bg / "rumble.wav"), rumble.astype(np.float32), SR)
