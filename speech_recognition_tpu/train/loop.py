"""Training loop — one jitted, batch-sharded program per step.

The reference's step is: Python draws per-sample randomness, runs one TF
session call *per sample* for augment+features, then Keras
train_on_batch (train.py:69-71, input_data.py:457-536). Here the entire
step — sample selection, bank gather, int16 decode, augmentation,
feature extraction, forward/backward, optimizer update — is a single
XLA program taking only (state, PRNG key). Batches are sharded over the
data-parallel mesh; XLA inserts the gradient psum over ICI.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import core, struct
from jax.sharding import NamedSharding, PartitionSpec as P

from speech_recognition_tpu.config import AugmentConfig, ModelSettings
from speech_recognition_tpu.data.device_bank import DeviceDataset
from speech_recognition_tpu.data.wav import INT16_DECODE_SCALE
from speech_recognition_tpu.models import build_model
from speech_recognition_tpu.ops.augment import augment_batch
from speech_recognition_tpu.ops.frontend import Frontend
from speech_recognition_tpu.parallel.mesh import (
    constrain_batch, make_mesh,
)
from speech_recognition_tpu.train import metrics as M
from speech_recognition_tpu.train.optim import (
    build_optimizer, l2_kernel_penalty, smooth_cross_entropy,
)


class TrainState(struct.PyTreeNode):
    """Flax-style train state + BatchNorm running statistics."""

    step: jax.Array
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: Any
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params)
        import optax
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)


@dataclasses.dataclass
class Trainer:
    """End-to-end trainer for one zoo model on a DeviceDataset.

    Parity with the reference recipe (train.py:22-75): per-model optimizer
    and label smoothing come from the registry; validation runs a
    confusion sweep each epoch that feeds ReduceLROnPlateau and
    best-checkpointing.
    """

    model_name: str
    settings: ModelSettings
    # HBM-resident corpus (the primary path). None = streaming mode:
    # batches come from a HostPrefetchLoader via ``fit_streaming`` /
    # ``train_step_stream`` and only the background bank lives on
    # device. Cutoff: the staged int16 bank costs ~65 KB/clip in the
    # chunked layout (32 KB flat + a second doubled copy when the
    # fused path chunks a flat bank on device), so ~15k clips/GB — a
    # corpus beyond ~150k clips per 16 GB v5e chip (after model/
    # activation memory) should stream.
    dataset: Optional[DeviceDataset] = None
    # Background-noise bank for streaming mode (with a dataset, the
    # dataset's own bank is used).
    background: Optional[Any] = None
    augment: AugmentConfig = AugmentConfig()
    batch_size: int = 384
    seed: int = 0
    mesh: Optional[Any] = None
    filter_mult: int = 1
    # Doubled-bank decode+augment: on single-device TPU the fused Pallas
    # kernel; elsewhere the XLA contiguous-dynamic-slice formulation
    # (ops/augment.rolled_decode_augment). Both avoid the elementwise
    # roll gather XLA sometimes lowers catastrophically. Costs 2x int16
    # bank HBM. Default on.
    use_fused_augment: Optional[bool] = None
    # Mixed precision: 'bfloat16' runs the model forward/backward in bf16
    # (params cast per-step; f32 master weights, f32 loss/optimizer/BN
    # statistics estimation). Halves activation HBM traffic on TPU.
    # 'float32' = reference-exact. 'auto' (default) = bfloat16 on TPU,
    # float32 elsewhere — validated convergence-equal on the synthetic
    # 12-class harness (val acc 1.0 both, val loss 0.0877 vs 0.0915).
    compute_dtype: str = "auto"
    # Ablation hooks (calibrate_accuracy.py): extra module-constructor
    # kwargs (e.g. {"head": "flatten"} on conv_2d_fast) and a learning-
    # rate override of the registry recipe. None = reference-exact.
    model_kwargs: Optional[Dict[str, Any]] = None
    learning_rate: Optional[float] = None
    # Frontend matmul precision for the mfcc/spec data path. 'highest'
    # is the parity-exact default everywhere outside training; 'auto'
    # follows compute_dtype (bfloat16 -> single-pass 'fastest': the two
    # HIGHEST DFT matmuls cost ~0.7 ms/step at batch 384, a quarter of
    # an mfcc-model step, for feature error ~1e-2 — far below
    # augmentation noise). Export/inference paths keep HIGHEST.
    frontend_precision: str = "auto"

    def __post_init__(self):
        if self.compute_dtype == "auto":
            self.compute_dtype = ("bfloat16"
                                  if jax.default_backend() == "tpu"
                                  else "float32")
        if self.mesh is None:
            self.mesh = make_mesh()
        if self.dataset is None:
            self.use_fused_augment = False
        elif self.background is None:
            self.background = self.dataset.background
        if self.use_fused_augment is None:
            # chunked banks need lane-aligned clips (true for the 16 kHz
            # one-second Speech Commands geometry)
            self.use_fused_augment = (
                self.settings.desired_samples % 128 == 0)
        self._bank_chunks = None
        self._bg_chunks = None
        self._use_pallas_augment = False
        if self.use_fused_augment:
            from speech_recognition_tpu.ops.pallas.augment_kernel import (
                chunk_background, double_bank,
            )
            t = self.settings.desired_samples
            if self.dataset.chunked:
                # the bank is ALREADY stored in the doubled-chunk layout
                # (built on the host) — no second HBM copy, no on-device
                # doubling transient
                self._bank_chunks = self.dataset.wav_bank
            else:
                self._bank_chunks = jax.jit(double_bank)(
                    self.dataset.wav_bank)
            bg = self.dataset.background
            flat = (bg.flat if bg is not None
                    else jnp.zeros((t,), jnp.float32))
            self._bg_chunks = jax.jit(
                lambda f: chunk_background(f, t))(flat)
            import os
            num_devices = self.mesh.devices.size
            per_device_batch = self.batch_size // max(1, num_devices)
            self._use_pallas_augment = (
                jax.default_backend() == "tpu"
                and self.batch_size % max(1, num_devices) == 0
                and per_device_batch % 8 == 0
                and not os.environ.get("SRT_DISABLE_PALLAS_AUGMENT"))
        s = self.settings
        self.module, self.spec = build_model(
            self.model_name, num_classes=s.label_count,
            spectrogram_length=s.spectrogram_length,
            num_log_mel_features=s.num_log_mel_features,
            spectrogram_frequencies=s.spectrogram_frequencies,
            desired_samples=s.desired_samples,
            window_size_samples=s.window_size_samples,
            window_stride_samples=s.window_stride_samples,
            model_kwargs=self.model_kwargs)
        fp = self.frontend_precision
        if fp == "auto":
            fp = ("fastest" if self.compute_dtype == "bfloat16"
                  else "highest")
        self.frontend = Frontend(s, precision={
            "highest": jax.lax.Precision.HIGHEST,
            "fastest": jax.lax.Precision.DEFAULT,
        }[fp])
        self.representation = self.spec.representation
        self._jit_train_step = jax.jit(self._train_step, donate_argnums=0)
        self._jit_eval_step = jax.jit(self._eval_step)

    # -- setup ------------------------------------------------------------

    def _features(self, wav: jax.Array):
        return self.frontend.features(wav, self.representation)

    def init_state(self) -> TrainState:
        key = jax.random.PRNGKey(self.seed)
        wav = jnp.zeros((2, self.settings.desired_samples), jnp.float32)
        x = self._features(wav)
        variables = self.module.init(
            {"params": key, "dropout": key}, x, train=False)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", core.freeze({}))
        tx = build_optimizer(self.spec.optimizer,
                             self.learning_rate or self.spec.learning_rate,
                             self.spec.momentum)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            apply_fn=self.module.apply,
            tx=tx)
        # replicate across the mesh
        replicated = NamedSharding(self.mesh, P())
        return jax.tree_util.tree_map(
            lambda a: jax.device_put(a, replicated)
            if isinstance(a, jax.Array) else a, state)

    # -- steps ------------------------------------------------------------

    def _cast_compute(self, tree):
        if self.compute_dtype == "float32":
            return tree
        dt = jnp.dtype(self.compute_dtype)
        return jax.tree_util.tree_map(
            lambda a: a.astype(dt)
            if hasattr(a, "dtype") and a.dtype == jnp.float32 else a, tree)

    def _forward_batch(self, params, batch_stats, x, train, dropout_key):
        # mixed precision: cast f32 params/stats/inputs to the compute
        # dtype; flax's dtype promotion then runs the whole net there.
        # Master params stay f32 (grads are cast back by value_and_grad's
        # cotangent flowing through astype). BN stats updates that come
        # back in low precision are re-cast to f32 below.
        params = self._cast_compute(params)
        x = self._cast_compute(x)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = self._cast_compute(batch_stats)
        if train:
            mutable = ["batch_stats"] if batch_stats else []
            out = self.apply_or_call(variables, x, True,
                                     {"dropout": dropout_key}, mutable)
            if mutable:
                logits, updated = out
                new_stats = jax.tree_util.tree_map(
                    lambda a: a.astype(jnp.float32), updated["batch_stats"])
                return logits.astype(jnp.float32), new_stats
            return out.astype(jnp.float32), batch_stats
        logits = self.apply_or_call(variables, x, False, None, [])
        return logits.astype(jnp.float32), batch_stats

    def apply_or_call(self, variables, x, train, rngs, mutable):
        kwargs = dict(train=train)
        if rngs:
            kwargs["rngs"] = rngs
        if mutable:
            kwargs["mutable"] = mutable
        return self.module.apply(variables, x, **kwargs)

    def _sample_batch(self, key: jax.Array, pseudo_frequency: jax.Array,
                      ds: DeviceDataset, bank_chunks, bg_chunks):
        """Sample + decode + augment + featurize one training batch.

        Returns (features, labels, dropout_key) — the shared data path of
        the train and stats-estimation steps.
        """
        k_sample, k_aug, k_drop = jax.random.split(key, 3)
        fids, labels, silence = ds.sample_train_ids(
            k_sample, self.batch_size, pseudo_frequency)
        fids, labels, silence = constrain_batch(
            (fids, labels, silence), self.mesh)
        if self.use_fused_augment:
            from speech_recognition_tpu.ops.augment import (
                draw_augment_params, rolled_decode_augment,
            )
            t = ds.desired_samples
            shift, fg_vol, bg_pos, bg_vol = draw_augment_params(
                k_aug, silence, self.augment, ds.background,
                self.batch_size, t)
            if self._use_pallas_augment:
                if self.mesh.devices.size > 1:
                    from speech_recognition_tpu.ops.pallas.sharded import (
                        fused_decode_augment_sharded,
                    )
                    wav = fused_decode_augment_sharded(
                        self.mesh, bank_chunks, bg_chunks, fids, shift,
                        fg_vol, bg_pos, bg_vol, num_samples=t)
                else:
                    from speech_recognition_tpu.ops.pallas.augment_kernel \
                        import fused_decode_augment_flat
                    wav = fused_decode_augment_flat(
                        bank_chunks, bg_chunks, fids, shift, fg_vol,
                        bg_pos, bg_vol, num_samples=t)
            else:
                wav = rolled_decode_augment(
                    bank_chunks, ds.background, fids, shift,
                    fg_vol, bg_pos, bg_vol, num_samples=t)
        else:
            wav = ds.decode(fids)
            wav = augment_batch(k_aug, wav, silence, self.augment,
                                background=ds.background, training=True)
        x = self._features(wav)
        x = constrain_batch(x, self.mesh)
        return x, labels, k_drop

    def _update_step(self, state: TrainState, x, labels, k_drop):
        """Forward/backward/optimizer update on featurized inputs —
        shared tail of the HBM-bank and streaming train steps."""

        def loss_fn(params):
            logits, new_stats = self._forward_batch(
                params, state.batch_stats, x, True, k_drop)
            loss = smooth_cross_entropy(logits, labels,
                                        self.spec.label_smoothing)
            loss = loss + l2_kernel_penalty(params, self.spec.l2_reg)
            return loss, (logits, new_stats)

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_stats)
        acc = (logits.argmax(-1) == labels).mean()
        return new_state, {"loss": loss, "categorical_accuracy": acc}

    def _train_step(self, state: TrainState, key: jax.Array,
                    pseudo_frequency: jax.Array, ds: DeviceDataset,
                    bank_chunks, bg_chunks):
        x, labels, k_drop = self._sample_batch(
            key, pseudo_frequency, ds, bank_chunks, bg_chunks)
        return self._update_step(state, x, labels, k_drop)

    def _train_many(self, state: TrainState, keys: jax.Array,
                    pseudo_frequency: jax.Array, ds: DeviceDataset,
                    bank_chunks, bg_chunks):
        def body(st, k):
            return self._train_step(st, k, pseudo_frequency, ds,
                                    bank_chunks, bg_chunks)
        return jax.lax.scan(body, state, keys)

    def _stream_step(self, state: TrainState, key: jax.Array,
                     wav: jax.Array, labels: jax.Array,
                     silence: jax.Array, background):
        """Train step on a host-streamed batch.

        Sampling/decode happened on the host (HostPrefetchLoader); the
        batch arrives as raw int16 (the loader's wire format — half the
        link bytes of f32) and the 1/32768 decode scale runs here,
        on-device, where XLA fuses it into the augment graph. f32 input
        is still accepted for callers that pre-scale. Device-side
        augmentation with the background bank and the feature frontend
        are unchanged vs the bank path.
        """
        k_aug, k_drop = jax.random.split(key)
        wav, labels, silence = constrain_batch(
            (wav, labels, silence), self.mesh)
        if jnp.issubdtype(wav.dtype, jnp.integer):
            wav = wav.astype(jnp.float32) / INT16_DECODE_SCALE
        wav = augment_batch(k_aug, wav, silence, self.augment,
                            background=background, training=True)
        x = self._features(wav)
        x = constrain_batch(x, self.mesh)
        return self._update_step(state, x, labels, k_drop)

    def _eval_step(self, state: TrainState, ds: DeviceDataset,
                   fids, labels, silence):
        fids, labels, silence = constrain_batch(
            (fids, labels, silence), self.mesh)
        wav = ds.decode(fids)
        wav = augment_batch(jax.random.PRNGKey(0), wav, silence,
                            self.augment.eval_variant(),
                            background=None, training=False)
        x = self._features(wav)
        logits, _ = self._forward_batch(state.params, state.batch_stats,
                                        x, False, None)
        conf = M.confusion_matrix(labels, logits.argmax(-1),
                                  self.settings.label_count)
        loss_sum = -jnp.take_along_axis(
            jax.nn.log_softmax(logits), labels[:, None], axis=1).sum()
        return conf, loss_sum

    # -- public API --------------------------------------------------------

    def train_step(self, state: TrainState, key: jax.Array,
                   pseudo_frequency: Optional[float] = None):
        if self.dataset is None:
            raise ValueError("no DeviceDataset — this trainer is in "
                             "streaming mode; use train_step_stream / "
                             "fit_streaming")
        if pseudo_frequency is None:
            pseudo_frequency = self.augment.pseudo_frequency
        return self._jit_train_step(
            state, key, jnp.asarray(pseudo_frequency, jnp.float32),
            self.dataset, self._bank_chunks, self._bg_chunks)

    def train_many(self, state: TrainState, keys: jax.Array,
                   pseudo_frequency: Optional[float] = None):
        """``len(keys)`` chained train steps as ONE compiled program.

        A ``lax.scan`` of ``_train_step`` over the per-step PRNG keys:
        step-for-step identical to calling ``train_step`` with the same
        key sequence (pinned by tests/test_train.py), but dispatched as
        a single XLA execution. That amortizes per-execution host and
        transport cost — on the tunneled bench host one remote
        execution costs ~10-15 ms regardless of size, so per-step
        dispatch caps throughput well below device speed (flagship
        batch 384: ~9.1 ms/step per-step vs ~4.2 ms/step at 25
        steps/dispatch vs ~3.1 ms/step traced device busy).

        Returns ``(state, metrics)`` with each metric stacked over the
        scanned steps (shape ``[len(keys)]``). Each distinct
        ``len(keys)`` compiles its own executable (jit shape cache).
        """
        if self.dataset is None:
            raise ValueError("no DeviceDataset — this trainer is in "
                             "streaming mode; use train_step_stream / "
                             "fit_streaming")
        if pseudo_frequency is None:
            pseudo_frequency = self.augment.pseudo_frequency
        if not hasattr(self, "_jit_train_many"):
            self._jit_train_many = jax.jit(self._train_many,
                                           donate_argnums=0)
        return self._jit_train_many(
            state, keys, jnp.asarray(pseudo_frequency, jnp.float32),
            self.dataset, self._bank_chunks, self._bg_chunks)

    def train_step_stream(self, state: TrainState, key: jax.Array,
                          wav: jax.Array, labels: jax.Array,
                          silence: jax.Array):
        """One update from a host-streamed batch (see ``fit_streaming``)."""
        if not hasattr(self, "_jit_stream_step"):
            self._jit_stream_step = jax.jit(self._stream_step,
                                            donate_argnums=0)
        return self._jit_stream_step(state, key, wav, labels, silence,
                                     self.background)

    def _stream_many(self, state, keys, wavs, labels, silences,
                     background):
        def body(st, xs):
            k, wav, lab, sil = xs
            return self._stream_step(st, k, wav, lab, sil, background)
        return jax.lax.scan(body, state, (keys, wavs, labels, silences))

    def train_many_stream(self, state: TrainState, keys: jax.Array,
                          wavs: jax.Array, labels: jax.Array,
                          silences: jax.Array):
        """K chained streamed updates as ONE compiled program.

        The streaming analogue of ``train_many``: scans ``_stream_step``
        over stacked host batches (``wavs`` ``[K, B, T]`` etc.), so K
        updates cost one remote execution instead of K. Semantics are
        step-for-step identical to ``train_step_stream`` with the same
        key/batch sequence (pinned by tests/test_streaming_train.py).
        """
        if not hasattr(self, "_jit_stream_many"):
            self._jit_stream_many = jax.jit(self._stream_many,
                                            donate_argnums=0)
        return self._jit_stream_many(state, keys, wavs, labels,
                                     silences, self.background)

    def fit_streaming(self, state: TrainState, loader,
                      steps: int, log_every: int = 0,
                      steps_per_dispatch: int = 1,
                      ) -> Tuple[TrainState, Dict[str, list]]:
        """Train from a ``HostPrefetchLoader`` (corpora that exceed HBM).

        The loader's producer thread decodes WAV batches with the native
        codec and uploads them while the device computes; this loop only
        dispatches. Multi-host: shard the loader's path list with
        ``parallel.distributed.process_shard`` and give the loader the
        batch sharding of the global mesh — every process runs the same
        loop and XLA's collectives keep the replicated state in sync
        (identical to the bank path's DP semantics).
        ``steps_per_dispatch`` > 1 stacks that many loader batches and
        runs them as one scanned execution (``train_many_stream``) —
        same updates, fewer remote executions.
        """
        history: Dict[str, list] = {}
        key = jax.random.PRNGKey(self.seed + 3)
        t0 = time.time()
        metrics = None
        step = 0
        while step < steps:
            chunk = min(steps_per_dispatch, steps - step)
            if chunk > 1:
                batches = [next(loader) for _ in range(chunk)]
                keys = jnp.stack([jax.random.fold_in(key, step + i)
                                  for i in range(chunk)])
                state, ms = self.train_many_stream(
                    state, keys,
                    jnp.stack([b[0] for b in batches]),
                    jnp.stack([b[1] for b in batches]),
                    jnp.stack([b[2] for b in batches]))
                metrics = {k: v[-1] for k, v in ms.items()}
            else:
                wav, labels, silence = next(loader)
                state, metrics = self.train_step_stream(
                    state, jax.random.fold_in(key, step), wav, labels,
                    silence)
            step += chunk
            if log_every and (step % log_every < chunk):
                m = {k: float(v) for k, v in metrics.items()}
                print(f"  stream step {step}/{steps}: {m}")
                for k, v in m.items():
                    history.setdefault(k, []).append(v)
        if metrics is not None:
            # the float() readbacks force the step chain before the
            # clips_per_sec timestamp (block_until_ready does not
            # guarantee completion on every platform — see
            # export/benchmark.py)
            for k, v in metrics.items():
                history.setdefault(k, []).append(float(v))
        history["clips_per_sec"] = [
            steps * self.batch_size / max(time.time() - t0, 1e-9)]
        return state, history

    # HISTORY: a lax.scan "train_many" path was deleted in round 2 after
    # a head-to-head that read 1.40 ms/step (per-step) vs 190 ms/step
    # (scan). That comparison was invalid: the per-step number was taken
    # with block_until_ready, which does not wait for remote execution
    # on this platform (export/benchmark.py module doc), so it measured
    # dispatch rate. Under honest chained-readback timing the ranking
    # inverts — flagship batch 384: ~9.1 ms/step per-step vs ~4.2
    # ms/step scanned at 25 steps/dispatch — and train_many (above) was
    # reinstated in round 3.


    def _stats_step(self, state: TrainState, key: jax.Array,
                    pseudo_frequency: jax.Array, ds: DeviceDataset,
                    bank_chunks, bg_chunks):
        """One train-mode forward; returns the *exact* batch statistics
        recovered from flax's momentum update (ra' = m*ra + (1-m)*batch).

        Always runs in float32 regardless of ``compute_dtype``: the
        recovery divides a momentum-sized difference by (1-m)=0.01, which
        amplifies rounding 100x — in bfloat16 that yields garbage (even
        negative variances). Statistics estimation is a tiny cost.
        """
        x, labels, k_drop = self._sample_batch(
            key, pseudo_frequency, ds, bank_chunks, bg_chunks)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, updated = self.module.apply(
            variables, x, train=True, rngs={"dropout": k_drop},
            mutable=["batch_stats"])
        m = 0.99  # layers.BN_MOMENTUM
        return jax.tree_util.tree_map(
            lambda new, old: (new - m * old) / (1.0 - m),
            updated["batch_stats"], state.batch_stats)

    def recalibrate_batch_stats(self, state: TrainState,
                                num_batches: int = 16,
                                key: Optional[jax.Array] = None,
                                pseudo_frequency: Optional[float] = None,
                                ) -> TrainState:
        """Re-estimate BatchNorm running statistics by averaging exact
        batch statistics over fresh training batches (classic BN
        re-estimation, as used for SWA / short-schedule training).

        Keras-parity momentum 0.99 needs O(1000) steps before the running
        stats reflect the data; on shorter schedules eval-mode BN then
        normalizes with near-init statistics and deep trunks collapse to
        uniform logits. (The reference never hit this because its recipe
        always runs ~17k steps, train.py:69-71.) This fixes eval quality
        independent of schedule length: one pass sets the stats to the
        sample average of per-batch mean/var.
        """
        if not state.batch_stats:
            return state
        if key is None:
            key = jax.random.PRNGKey(self.seed + 7)
        if pseudo_frequency is None:
            pseudo_frequency = self.augment.pseudo_frequency
        pf = jnp.asarray(pseudo_frequency, jnp.float32)
        if not hasattr(self, "_jit_stats_step"):
            self._jit_stats_step = jax.jit(self._stats_step)
        total = None
        for i in range(num_batches):
            batch_stats = self._jit_stats_step(
                state, jax.random.fold_in(key, i), pf, self.dataset,
                self._bank_chunks, self._bg_chunks)
            total = batch_stats if total is None else jax.tree_util.tree_map(
                jnp.add, total, batch_stats)
        mean_stats = jax.tree_util.tree_map(
            lambda a: a / num_batches, total)
        return state.replace(batch_stats=mean_stats)

    def _stream_stats_step(self, state: TrainState, key: jax.Array,
                           wav: jax.Array, labels: jax.Array,
                           silence: jax.Array, background):
        """Streamed-batch variant of ``_stats_step`` (same f32-only
        momentum-recovery math; see that docstring)."""
        del labels
        k_aug, k_drop = jax.random.split(key)
        wav, silence = constrain_batch((wav, silence), self.mesh)
        wav = augment_batch(k_aug, wav, silence, self.augment,
                            background=background, training=True)
        x = self._features(wav)
        x = constrain_batch(x, self.mesh)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        _, updated = self.module.apply(
            variables, x, train=True, rngs={"dropout": k_drop},
            mutable=["batch_stats"])
        m = 0.99  # layers.BN_MOMENTUM
        return jax.tree_util.tree_map(
            lambda new, old: (new - m * old) / (1.0 - m),
            updated["batch_stats"], state.batch_stats)

    def recalibrate_batch_stats_stream(self, state: TrainState, loader,
                                       num_batches: int = 16,
                                       key: Optional[jax.Array] = None,
                                       ) -> TrainState:
        """``recalibrate_batch_stats`` for streaming mode: averages exact
        batch statistics over ``num_batches`` loader batches (needed for
        short schedules — see the bank-path docstring)."""
        if not state.batch_stats:
            return state
        if key is None:
            key = jax.random.PRNGKey(self.seed + 9)
        if not hasattr(self, "_jit_stream_stats_step"):
            self._jit_stream_stats_step = jax.jit(self._stream_stats_step)
        total = None
        for i in range(num_batches):
            wav, labels, silence = next(loader)
            bs = self._jit_stream_stats_step(
                state, jax.random.fold_in(key, i), wav, labels, silence,
                self.background)
            total = bs if total is None else jax.tree_util.tree_map(
                jnp.add, total, bs)
        mean_stats = jax.tree_util.tree_map(
            lambda a: a / num_batches, total)
        return state.replace(batch_stats=mean_stats)

    def evaluate(self, state: TrainState, mode: str = "validation",
                 ) -> Tuple[np.ndarray, float]:
        """Deterministic sweep; returns (confusion matrix, mean log loss).

        Like the reference, trailing samples beyond a full batch are
        dropped (steps = set_size // batch_size, train.py:58,70).
        """
        ds = self.dataset
        if ds is None:
            raise ValueError("evaluate() needs a DeviceDataset; in "
                             "streaming mode stage an eval partition as "
                             "a (small) DeviceDataset")
        set_size = ds.set_size(mode)
        if set_size == 0:
            raise ValueError(f"partition {mode!r} is empty")
        # reference semantics: trailing partial batch dropped — but a
        # set smaller than the batch must not silently evaluate nothing
        # (batch 384 vs a small validation split), so the batch shrinks
        # to the set size in that case (one extra compile, eval-only).
        # On a mesh the shrunk batch stays a multiple of the device
        # count so the sharding constraint holds.
        batch = min(self.batch_size, set_size)
        num_dev = int(self.mesh.devices.size)
        if batch % num_dev:
            batch = (batch // num_dev) * num_dev
            if batch == 0:
                raise ValueError(
                    f"partition {mode!r} has {set_size} samples — fewer "
                    f"than the {num_dev}-device mesh can shard")
        steps = set_size // batch
        conf = np.zeros((self.settings.label_count,
                         self.settings.label_count), np.int64)
        loss_sum, n = 0.0, 0
        for i in range(steps):
            fids, labels, silence = ds.eval_ids(
                mode, i * batch, batch)
            c, ls = self._jit_eval_step(state, ds, fids, labels, silence)
            conf += np.asarray(c, np.int64)
            loss_sum += float(ls)
            n += batch
        return conf, loss_sum / max(n, 1)

    def fit(self, state: TrainState, epochs: int,
            steps_per_epoch: Optional[int] = None,
            callbacks: Iterable[Any] = (),
            pseudo_schedule: Optional[Callable[[int], float]] = None,
            log_every: int = 0,
            bn_recalibration_batches: int = 0,
            steps_per_dispatch: int = 1,
            ) -> Tuple[TrainState, Dict[str, list]]:
        """Epoch loop with per-epoch validation metrics.

        ``callbacks`` receive ``on_epoch_end(epoch, state, logs)`` and may
        return a new state (e.g. LR controller). ``pseudo_schedule`` maps
        epoch -> pseudo_frequency (the reference sketched one at
        utils.py:41-49; see ``reference_pseudo_schedule``) without
        recompiling — the frequency is a traced scalar.
        ``bn_recalibration_batches`` > 0 re-estimates BatchNorm running
        statistics before each validation sweep (see
        ``recalibrate_batch_stats``) — recommended for short schedules.
        ``steps_per_dispatch`` > 1 executes that many chained steps per
        XLA dispatch (``train_many``); same updates and key sequence,
        fewer remote executions — see ``train_many`` for measurements.
        A non-multiple epoch length costs one extra executable for the
        tail chunk.
        """
        if self.dataset is None:
            raise ValueError("fit() needs a DeviceDataset; use "
                             "fit_streaming for loader-based training")
        if steps_per_epoch is None:
            steps_per_epoch = max(
                1, self.dataset.set_size("training") // self.batch_size)
        history: Dict[str, list] = {}
        base_key = jax.random.PRNGKey(self.seed + 1)
        for epoch in range(epochs):
            t0 = time.time()
            running = {}
            pf = (pseudo_schedule(epoch) if pseudo_schedule
                  else self.augment.pseudo_frequency)
            # one split per epoch instead of a fold_in dispatch per step
            epoch_keys = jax.random.split(
                jax.random.fold_in(base_key, epoch), steps_per_epoch)
            step = 0
            while step < steps_per_epoch:
                chunk = min(steps_per_dispatch, steps_per_epoch - step)
                if chunk > 1:
                    state, ms = self.train_many(
                        state, epoch_keys[step:step + chunk], pf)
                    running = {k: v[-1] for k, v in ms.items()}
                else:
                    state, running = self.train_step(
                        state, epoch_keys[step], pf)
                step += chunk
                if log_every and (step % log_every < chunk):
                    m = {k: float(v) for k, v in running.items()}
                    print(f"  step {step}/{steps_per_epoch}: {m}")
            # the float() readback forces the whole step chain; epoch
            # timing must cover real execution, and block_until_ready
            # does NOT guarantee that on every platform (see
            # export/benchmark.py module doc)
            logs = {k: float(v) for k, v in running.items()}
            train_time = time.time() - t0
            logs["epoch_time_s"] = train_time
            logs["clips_per_sec"] = (
                steps_per_epoch * self.batch_size / train_time)
            if bn_recalibration_batches > 0:
                state = self.recalibrate_batch_stats(
                    state, bn_recalibration_batches,
                    key=jax.random.fold_in(base_key, 100_000 + epoch),
                    pseudo_frequency=pf)
            conf, val_loss = self.evaluate(state)
            logs["val_loss"] = val_loss
            logs["val_categorical_accuracy"] = M.accuracy(conf)
            logs["confusion"] = conf
            for cb in callbacks:
                result = cb.on_epoch_end(epoch, state, logs)
                if isinstance(result, TrainState):
                    state = result
            for k, v in logs.items():
                history.setdefault(k, []).append(v)
        return state, history


def reference_pseudo_schedule(epoch: int) -> float:
    """The pseudo-ratio schedule sketched in the reference
    (utils.py:41-49), promoted to a real feature: heavy pseudo mixing
    early, tapering as the model matures."""
    if epoch <= 20:
        return 1.0
    if epoch <= 30:
        return 0.7
    if epoch <= 40:
        return 0.4
    return 0.2
