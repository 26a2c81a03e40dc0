"""Device-resident dataset bank + batched sample selection.

The TPU-first answer to the reference's data layer: instead of a
per-sample file-read/decode/augment round-trip (input_data.py:457-536),
the *entire* training corpus lives in HBM as a packed int16 array
(Speech Commands: ~64k clips x 16000 samples x 2 B ~= 2 GB), and each
train step gathers, decodes (int16 -> f32/32768), and augments a batch
inside one jitted program. Zero host<->device transfer per step.

Sample-selection parity (input_data.py:459-468): training draws are
uniform over the partition, with ``pseudo_frequency`` probability of
drawing from the pseudo partition instead; validation/testing walk the
partition deterministically.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from speech_recognition_tpu.config import ModelSettings
from speech_recognition_tpu.data.index import DatasetIndex
from speech_recognition_tpu.data.wav import (
    INT16_DECODE_SCALE,
    decode_batch_int16,
    decode_files_variable,
)
from speech_recognition_tpu.ops.augment import BackgroundBank


class Partition(struct.PyTreeNode):
    """Per-partition device arrays indexing into the shared wav bank."""

    file_ids: jax.Array    # [n] int32 -> row in wav bank
    labels: jax.Array      # [n] int32 class index
    is_silence: jax.Array  # [n] bool

    @property
    def size(self) -> int:
        return int(self.file_ids.shape[0])


class DeviceDataset(struct.PyTreeNode):
    """Packed dataset living in device memory.

    A pytree node: pass it as a jit argument, never a closure capture —
    the bank is hundreds of MB and would be embedded in the program.

    Two storage layouts for ``wav_bank``:

    * flat (``chunked=False``): ``[num_files, T]`` int16 — the simple
      form, used on CPU and whenever ``T`` is not lane-aligned.
    * chunked (``chunked=True``): the periodic ``[num_files * pc, 2,
      128]`` int16 chunk stack of ``ops.pallas.augment_kernel.
      double_bank`` — the layout the fused augment path needs anyway.
      Storing THIS as the one and only bank (built on the host, so the
      flat form never touches HBM) cuts the training working set by
      the flat bank's size (Speech Commands: ~2.4 GB of a ~7.3 GB
      total) and removes the on-device doubling transient. ``decode``
      reconstructs exact clips from the stack (each clip's chunk rows
      are the clip tiled periodically, so their row-major prefix IS
      the clip).
    """

    wav_bank: jax.Array                 # int16; layout per `chunked`
    partitions: Dict[str, Partition]
    background: Optional[BackgroundBank]
    num_classes: int = struct.field(pytree_node=False)
    desired_samples: int = struct.field(pytree_node=False)
    chunked: bool = struct.field(pytree_node=False, default=False)

    def set_size(self, mode: str) -> int:
        return self.partitions[mode].size

    @property
    def num_clips(self) -> int:
        """Clips in the bank regardless of storage layout."""
        if not self.chunked:
            return int(self.wav_bank.shape[0])
        from speech_recognition_tpu.ops.pallas.augment_kernel import (
            fg_chunks_per_clip,
        )
        return (int(self.wav_bank.shape[0])
                // fg_chunks_per_clip(self.desired_samples))

    def decode(self, file_ids: jax.Array) -> jax.Array:
        """Gather + int16->float32 decode (decode_wav scaling, 1/32768)."""
        if self.chunked:
            from speech_recognition_tpu.ops.pallas.augment_kernel import (
                decode_chunked,
            )
            return decode_chunked(self.wav_bank, file_ids,
                                  self.desired_samples)
        return (self.wav_bank[file_ids].astype(jnp.float32)
                / INT16_DECODE_SCALE)

    def sample_train_ids(self, key: jax.Array, batch_size: int,
                         pseudo_frequency=0.0,
                         ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Random (file_ids, labels, is_silence) for a training batch.

        ``pseudo_frequency`` may be a traced scalar so epoch schedules
        (utils.py:41-49) don't trigger recompiles.
        """
        train = self.partitions["training"]
        pseudo = self.partitions.get("pseudo")
        k_u, k_c, k_p = jax.random.split(key, 3)
        idx_c = jax.random.randint(k_c, (batch_size,), 0, train.size)
        file_ids = train.file_ids[idx_c]
        labels = train.labels[idx_c]
        silence = train.is_silence[idx_c]
        if pseudo is not None and pseudo.size > 0:
            use_pseudo = jax.random.uniform(k_u, (batch_size,)) \
                < pseudo_frequency
            idx_p = jax.random.randint(k_p, (batch_size,), 0, pseudo.size)
            file_ids = jnp.where(use_pseudo, pseudo.file_ids[idx_p], file_ids)
            labels = jnp.where(use_pseudo, pseudo.labels[idx_p], labels)
            silence = jnp.where(use_pseudo, pseudo.is_silence[idx_p], silence)
        return file_ids, labels, silence

    def eval_ids(self, mode: str, offset: int, batch_size: int,
                 ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Deterministic sequential batch (input_data.py:454,459-461)."""
        part = self.partitions[mode]
        sl = slice(offset, offset + batch_size)
        return part.file_ids[sl], part.labels[sl], part.is_silence[sl]

    def get_unprocessed_data(self, mode: str, how_many: int = -1,
                             offset: int = 0,
                             ) -> Tuple[jax.Array, jax.Array]:
        """Raw decoded clips + labels, silence muted, no augmentation
        (parity: input_data.py:543-589)."""
        part = self.partitions[mode]
        count = part.size if how_many == -1 else how_many
        sl = slice(offset, offset + count)
        wav = self.decode(part.file_ids[sl])
        wav = wav * jnp.where(part.is_silence[sl], 0.0, 1.0)[:, None]
        return wav, part.labels[sl]


def _auto_chunked(desired_samples: int) -> bool:
    """Default bank layout: chunked on TPU when lane-aligned (the fused
    augment path wants that layout anyway — storing it directly halves
    bank HBM), flat elsewhere (CPU tests poke rows; no fused path)."""
    return (jax.default_backend() == "tpu"
            and desired_samples % 128 == 0)


def _chunk_bank_host(bank_np: np.ndarray) -> np.ndarray:
    from speech_recognition_tpu.ops.pallas.augment_kernel import (
        double_bank_host,
    )
    return double_bank_host(bank_np)


def build_device_dataset(index: DatasetIndex,
                         settings: ModelSettings,
                         include_pseudo: bool = True,
                         device=None,
                         modes: Optional[Sequence[str]] = None,
                         chunked: Optional[bool] = None,
                         ) -> DeviceDataset:
    """Decode every referenced file once and upload the packed bank.

    Duplicate references (silence entries all point at one file,
    input_data.py:244-254) share a single bank row. ``modes`` restricts
    which partitions are staged (e.g. ``["validation"]`` for the
    streaming trainer, which keeps the training corpus on the host).
    ``chunked=None`` picks the storage layout automatically (see
    ``DeviceDataset`` / ``_auto_chunked``).
    """
    desired = settings.desired_samples
    if modes is None:
        modes = ["training", "validation", "testing"]
        if include_pseudo:
            modes.append("pseudo")
    modes = list(modes)

    path_to_row: Dict[str, int] = {}
    ordered_paths = []
    for mode in modes:
        for e in index.data_index[mode]:
            if e.file not in path_to_row:
                path_to_row[e.file] = len(ordered_paths)
                ordered_paths.append(e.file)

    bank_np = decode_batch_int16(ordered_paths, desired)
    if chunked is None:
        chunked = _auto_chunked(desired)
    if chunked:
        bank_np = _chunk_bank_host(bank_np)
    wav_bank = jax.device_put(bank_np, device)

    partitions = {}
    for mode in modes:
        entries = index.data_index[mode]
        file_ids = np.array([path_to_row[e.file] for e in entries],
                            dtype=np.int32)
        labels = index.labels_array(mode)
        silence = index.is_silence_array(mode)
        partitions[mode] = Partition(
            file_ids=jax.device_put(file_ids, device),
            labels=jax.device_put(labels, device),
            is_silence=jax.device_put(silence, device),
        )

    background = None
    if index.background_files:
        clips_i16 = decode_files_variable(index.background_files)
        clips = [c.astype(np.float32) / INT16_DECODE_SCALE
                 for c in clips_i16]
        clips = [c for c in clips if len(c) > desired]
        if clips:
            background = BackgroundBank.from_arrays(clips, desired)

    num_classes = max(index.word_to_index.values()) + 1
    return DeviceDataset(
        wav_bank=wav_bank,
        partitions=partitions,
        background=background,
        num_classes=num_classes,
        desired_samples=desired,
        chunked=chunked,
    )


def synthetic_device_dataset(num_train: int = 64,
                             num_val: int = 16,
                             num_pseudo: int = 8,
                             num_classes: int = 12,
                             desired_samples: int = 16000,
                             num_background: int = 2,
                             background_len: int = 48000,
                             seed: int = 0,
                             chunked: Optional[bool] = None,
                             ) -> DeviceDataset:
    """Random dataset for tests/benchmarks (no files involved)."""
    rng = np.random.default_rng(seed)
    n = num_train + num_val + num_pseudo
    bank = rng.integers(-2000, 2000, size=(n, desired_samples),
                        dtype=np.int16)
    if chunked is None:
        chunked = _auto_chunked(desired_samples)
    if chunked:
        bank = _chunk_bank_host(bank)
    parts = {}
    start = 0
    for mode, size in (("training", num_train), ("validation", num_val),
                       ("pseudo", num_pseudo)):
        ids = np.arange(start, start + size, dtype=np.int32)
        labels = rng.integers(0, num_classes, size=size).astype(np.int32)
        if size:
            labels[0] = 0  # ensure at least one silence entry
        parts[mode] = Partition(
            file_ids=jnp.asarray(ids),
            labels=jnp.asarray(labels),
            is_silence=jnp.asarray(labels == 0),
        )
        start += size
    parts["testing"] = Partition(
        file_ids=jnp.zeros((0,), jnp.int32),
        labels=jnp.zeros((0,), jnp.int32),
        is_silence=jnp.zeros((0,), bool),
    )
    bg = [rng.uniform(-0.1, 0.1, size=background_len).astype(np.float32)
          for _ in range(num_background)]
    background = BackgroundBank.from_arrays(bg, desired_samples)
    return DeviceDataset(
        wav_bank=jnp.asarray(bank),
        partitions=parts,
        background=background,
        num_classes=num_classes,
        desired_samples=desired_samples,
        chunked=chunked,
    )
