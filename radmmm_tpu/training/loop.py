"""Trainer: fit / validate / predict orchestration.

Functional replacement for the PyTorch-Lightning Trainer + TTSModel
LightningModule + sample-logging callbacks (tts_main.py, tts_lightning_
modules.py, training_callbacks.py). Phase-dependent graphs (binarization /
KL start iters) are separate compiled executables selected host-side; the
whitening data-init runs as an explicit pass on the first batch; validation
logs losses plus attention/mel images and (optionally vocoded) audio.
"""
from __future__ import annotations

import contextlib
import dataclasses
import functools
import os
import time
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from scipy.io import wavfile

from radmmm_tpu.models.tts import TTSModel, TTSConfig
from radmmm_tpu.parallel import mesh as pmesh
from radmmm_tpu.training.optim import build_optimizer
from radmmm_tpu.training.step import (LossConfig, TrainState,
                                      create_train_state, device_batch,
                                      make_train_megastep, make_train_step,
                                      make_val_step, make_whitening_init,
                                      phase_flags)
from radmmm_tpu.utils.checkpoint import (CheckpointManager,
                                         ENCODER_SUBMODULES, freeze_wrap,
                                         load_pretrained_submodules)
from radmmm_tpu.utils.logging import (TrainLogger, plot_alignment_to_numpy,
                                      plot_mel_to_numpy,
                                      plot_curves_to_numpy)
from radmmm_tpu.vocoder.utils import (get_vocoder, GriffinLimVocoder,
                                      get_audio_for_mels)


@dataclasses.dataclass
class TrainerConfig:
    output_directory: str = "./output"
    max_steps: int = 1_000_000
    max_epochs: int = 10_000
    val_interval: int = 500
    iters_per_checkpoint: int = 3000
    log_interval: int = 10
    seed: int = 42
    learning_rate: float = 1e-4
    weight_decay: float = 1e-6
    optim_algo: str = "RAdam"
    grad_clip_val: Optional[float] = 1.0
    use_syncbnorm: bool = False
    # mesh axes (the DDP `devices` equivalent): None = all visible devices
    # data-parallel; n_model > 1 additionally shards the WN coupling kernels
    # (tensor parallelism) per parallel.mesh's TP rules
    n_data: Optional[int] = None
    n_model: int = 1
    griffin_lim_iters: int = 30           # fallback vocoder iterations
    decoder_path: Optional[str] = None
    encoders_path: Optional[str] = None
    vocoder_type: str = "hifigan"         # 'hifigan' | 'waveglow'
    vocoder_config_path: Optional[str] = None
    vocoder_checkpoint_path: Optional[str] = None
    sampling_rate: int = 22050
    prediction_output_dir: Optional[str] = None
    predict_mode: str = "tts"
    sigma_infer: float = 0.8
    max_infer_frames: int = 1024
    hop_length: int = 256
    # 'f32' (reference regime) or 'bf16' (native MXU throughput)
    conv_precision: str = "f32"
    log_decoder_samples: bool = True
    # fixed prompts synthesized + logged at every validation (the
    # LogAttributeSamplesCallback idiom, training_callbacks.py:90-210)
    val_prompts_path: Optional[str] = None
    max_to_keep: Optional[int] = None
    # aux subsystems (SURVEY.md §5): profiling, anomaly detection, snapshot
    profile_dir: Optional[str] = None     # jax.profiler trace output
    profile_start_step: int = 10
    profile_n_steps: int = 5
    detect_anomaly: bool = False          # raise on non-finite loss
    save_code_snapshot: bool = True       # tar *.py on fit start
    # also write every validation image/audio as files under
    # <output_directory>/val_artifacts/step_N/ (in addition to TB)
    save_val_artifacts: bool = False
    # explicit checkpoint to restore (the reference's --ckpt_path,
    # README.md:70-80): an integer step in this run's dir, another run's
    # directory (its latest step), a ckpt dir, or an explicit orbax step
    # dir like <run>/ckpt/9000. None = latest in output_directory/ckpt.
    ckpt_path: Optional[str] = None
    # batches per device dispatch: >1 scans K same-shape batches
    # (device featurization + train step) inside ONE jitted program
    # (training/step.py make_train_megastep), amortizing the per-dispatch
    # host cost K-fold so end-to-end throughput tracks the pure step time.
    # Composes with data×model meshes (stacked groups shard their batch dim
    # on `data`) and with multi-host runs (the loader emits globally
    # agreeing K-runs); partial/boundary-crossing groups fall back to
    # per-batch steps.
    megastep_k: int = 8


class Trainer:
    def __init__(self, tts_config: TTSConfig, loss_config: LossConfig,
                 trainer_config: TrainerConfig):
        self.model = TTSModel(config=tts_config)
        self.loss_cfg = loss_config
        self.cfg = trainer_config
        from radmmm_tpu.ops.conv import set_conv_precision
        set_conv_precision("bf16" if self.cfg.conv_precision == "bf16"
                           else "f32")
        os.makedirs(self.cfg.output_directory, exist_ok=True)
        self.logger = TrainLogger(
            os.path.join(self.cfg.output_directory, "tb"),
            artifact_dir=(os.path.join(self.cfg.output_directory,
                                       "val_artifacts")
                          if self.cfg.save_val_artifacts else None),
            enabled=jax.process_index() == 0)
        self.ckpt = CheckpointManager(
            os.path.join(self.cfg.output_directory, "ckpt"),
            max_to_keep=self.cfg.max_to_keep)
        self._step_cache: Dict[Any, Any] = {}
        self.mesh = None                  # built in fit() from n_data/n_model
        self.frozen_prefixes = []
        if self.cfg.decoder_path:
            self.frozen_prefixes.append("decoder")
        if self.cfg.encoders_path:
            self.frozen_prefixes += [m for m in ENCODER_SUBMODULES
                                     if m != "accent_embeddings"
                                     or tts_config.use_accent]

    # ------------------------------------------------------------------
    def _resolve_ckpt(self):
        """cfg.ckpt_path -> (CheckpointManager, step or None)."""
        p = self.cfg.ckpt_path
        if p is None:
            return self.ckpt, None
        if isinstance(p, int) or (isinstance(p, str) and p.isdigit()):
            return self.ckpt, int(p)          # step in this run's manager
        path = os.path.abspath(os.path.expanduser(str(p)))
        if os.path.isdir(os.path.join(path, "ckpt")):   # a run directory
            return CheckpointManager(os.path.join(path, "ckpt")), None
        base = os.path.basename(path.rstrip("/"))
        if base.isdigit():                    # explicit orbax step dir
            return CheckpointManager(os.path.dirname(path)), int(base)
        if not os.path.isdir(path):
            raise FileNotFoundError(f"ckpt_path {p!r} does not exist")
        return CheckpointManager(path), None  # a ckpt dir itself

    def _restore_state(self, state, require: bool = False):
        mgr, step = self._resolve_ckpt()
        state, restored = mgr.restore(state, step=step)
        if require and restored is None:
            raise FileNotFoundError(
                "no checkpoint found"
                + (f" at ckpt_path={self.cfg.ckpt_path!r}"
                   if self.cfg.ckpt_path is not None
                   else f" under {self.ckpt.directory} (pass --ckpt_path)"))
        return state, restored

    def _build_optimizer(self, params):
        tx = build_optimizer(self.cfg.optim_algo, self.cfg.learning_rate,
                             self.cfg.weight_decay, self.cfg.grad_clip_val)
        return freeze_wrap(tx, params, self.frozen_prefixes)

    def _init_state(self, sample_batch) -> TrainState:
        rng = jax.random.key(self.cfg.seed)
        base_tx = build_optimizer(self.cfg.optim_algo,
                                  self.cfg.learning_rate,
                                  self.cfg.weight_decay,
                                  self.cfg.grad_clip_val)
        state = create_train_state(self.model, base_tx,
                                   device_batch(sample_batch), rng)
        params = state.params
        # pretrained submodule loading + freezing
        if self.cfg.decoder_path:
            params = load_pretrained_submodules(
                params, self.cfg.decoder_path, ["decoder"])
        if self.cfg.encoders_path:
            params = load_pretrained_submodules(
                params, self.cfg.encoders_path,
                [m for m in ENCODER_SUBMODULES
                 if m != "accent_embeddings"
                 or self.model.config.use_accent])
        self.tx = self._build_optimizer(params)
        return dataclasses.replace(state, params=params,
                                   opt_state=self.tx.init(params))

    # ------------------------------------------------------------------
    # mesh / sharding (the reference's DDP layer, SURVEY.md §2.7)
    def _make_mesh(self):
        """data×model Mesh over all visible devices; None when 1×1."""
        n_model = max(1, self.cfg.n_model)
        n_dev = jax.device_count()
        n_data = (self.cfg.n_data if self.cfg.n_data is not None
                  else max(1, n_dev // n_model))
        if n_data * n_model <= 1:
            return None
        return pmesh.make_mesh(n_data=n_data, n_model=n_model)

    def _put_batch(self, batch, train: bool = True):
        """Place a host batch: sharded over the data axis on a mesh (global
        batch = host batch × n_processes), plain device arrays otherwise.

        Ragged tail batches that don't divide the data axis return None for
        the caller to drop (DDP drop_last semantics); at validation on one
        host they run replicated instead so no val item is lost."""
        b = device_batch(batch)
        if self.mesh is None:
            return b
        n_data = self.mesh.shape[pmesh.DATA_AXIS]
        B_global = int(np.shape(b["text"])[0]) * jax.process_count()
        if B_global % n_data == 0:
            return pmesh.shard_batch(b, self.mesh)
        if not train and jax.process_count() == 1:
            return jax.device_put(b, pmesh.replicated(self.mesh))
        return None

    def _train_step_fn(self, binarize: bool, kl_on: bool):
        key = (binarize, kl_on)
        if key not in self._step_cache:
            fn = make_train_step(self.model, self.loss_cfg, self.tx,
                                 binarize=binarize, kl_on=kl_on,
                                 sync_bn=self.cfg.use_syncbnorm)
            self._step_cache[key] = jax.jit(fn, donate_argnums=0)
        return self._step_cache[key]

    def _jitted(self, name: str, make_fn):
        """One jitted callable per named sample/predict path, reused across
        validations — jax.jit's own shape-keyed cache handles the bucketed
        batch shapes, so each shape compiles once instead of dispatching
        the full model eagerly (~27 ms/dispatch on a relay-attached TPU
        makes an eager forward thousands of times slower than one call)."""
        if name not in self._step_cache:
            self._step_cache[name] = jax.jit(make_fn())
        return self._step_cache[name]

    # ------------------------------------------------------------------
    def save_current_code(self):
        """Tar the framework sources into the run dir (utils.py:44-51)."""
        import tarfile
        root = os.path.dirname(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
        out = os.path.join(self.cfg.output_directory, "code_snapshot.tar.gz")
        with tarfile.open(out, "w:gz") as tar:
            for dirpath, dirnames, filenames in os.walk(root):
                dirnames[:] = [d for d in dirnames
                               if d not in (".git", "output", "build",
                                            "__pycache__")]
                for fn in filenames:
                    if fn.endswith((".py", ".cc", ".yaml")):
                        full = os.path.join(dirpath, fn)
                        tar.add(full, arcname=os.path.relpath(full, root))
        print(f"saved code snapshot to {out}")

    def fit(self, dm, resume: bool = True):
        dm.setup("fit")
        if self.cfg.save_code_snapshot and jax.process_index() == 0:
            self.save_current_code()
        self.mesh = self._make_mesh()
        mesh_ctx = (jax.set_mesh(self.mesh) if self.mesh is not None
                    else contextlib.nullcontext())
        if self.mesh is not None:
            print(f"training over mesh {dict(self.mesh.shape)} "
                  f"({jax.process_count()} process(es), "
                  f"{jax.device_count()} devices)")
        with mesh_ctx:
            return self._fit_loop(dm, resume)

    def _fit_loop(self, dm, resume: bool):
        train_loader = dm.train_dataloader()
        first_batch = next(iter(train_loader))
        state = self._init_state(first_batch)

        start_step = 0
        restored = None
        if resume:
            state, restored = self._restore_state(state)
            if restored is not None:
                start_step = int(restored)
                print(f"resumed from step {start_step}")
                feat = getattr(dm, "featurizer", None)
                if feat is not None and hasattr(feat, "set_noise_base"):
                    feat.set_noise_base(start_step)

        if self.mesh is not None:
            state = pmesh.shard_state(state, self.mesh, self.tx)

        if restored is None:
            whiten = jax.jit(make_whitening_init(self.model))
            state = whiten(state, self._put_batch(first_batch, train=False))
            print("initialized whitening conv from first batch")

        val_step = jax.jit(make_val_step(self.model, self.loss_cfg))
        rng = jax.random.key(self.cfg.seed + 1)
        step = start_step
        t_last = time.perf_counter()
        step_last_logged = step
        mega_k = self._megastep_k(dm)

        def post_step(state, metrics, prev_step, step, n_steps):
            """Shared log/val/ckpt/stop handling; interval tests are
            'crossed a multiple of interval' so megasteps (step jumps of
            K) hit every interval exactly once."""
            nonlocal t_last, step_last_logged

            def crossed(interval):
                return prev_step // interval != step // interval

            if self.cfg.detect_anomaly:
                if not np.all(np.isfinite(np.asarray(metrics["loss"]))):
                    bad = {k: np.asarray(v).tolist()
                           for k, v in metrics.items()}
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {bad}")
            if crossed(self.cfg.log_interval):
                # megastep metrics are stacked (K,): log the latest step's
                m = {k: float(np.asarray(v).reshape(-1)[-1])
                     for k, v in metrics.items()}
                dt = time.perf_counter() - t_last
                # steps since the LAST LOG, not since the previous step:
                # with megastep K < log_interval the elapsed dt spans
                # several megasteps, so dividing only the last jump would
                # under-report by ~log_interval/K
                m["steps_per_sec"] = (step - step_last_logged) / dt
                t_last = time.perf_counter()
                step_last_logged = step
                self.logger.scalars("train", m, step)
                print(f"step {step}: loss={m['loss']:.4f} "
                      f"mel={m.get('loss_mel', 0):.4f} "
                      f"({m['steps_per_sec']:.2f} it/s)")
            if crossed(self.cfg.val_interval) and dm.valset:
                self.validate(state, dm, val_step, step)
            if crossed(self.cfg.iters_per_checkpoint):
                self.ckpt.save(step, state,
                               exclude_prefixes=self.frozen_prefixes)
            if step >= self.cfg.max_steps:
                self.ckpt.save(step, state,
                               exclude_prefixes=self.frozen_prefixes)
                return True
            return False

        if mega_k > 1:
            return self._fit_loop_mega(dm, state, rng, step, mega_k,
                                       post_step)

        for epoch in range(self.cfg.max_epochs):
            for batch in train_loader:
                binarize, kl_on = phase_flags(step, self.loss_cfg)
                step_fn = self._train_step_fn(binarize, kl_on)
                rng, sub = jax.random.split(rng)
                batch_dev = self._put_batch(batch)
                if batch_dev is None:
                    if int(np.shape(batch["text"])[0]) >= dm.batch_size:
                        raise ValueError(
                            f"batch size {dm.batch_size} × "
                            f"{jax.process_count()} process(es) is not "
                            f"divisible by the data axis "
                            f"({self.mesh.shape[pmesh.DATA_AXIS]})")
                    continue  # ragged tail batch (DDP drop_last semantics)
                if (self.cfg.profile_dir
                        and step == self.cfg.profile_start_step):
                    jax.profiler.start_trace(self.cfg.profile_dir)
                state, metrics = step_fn(state, batch_dev, sub)
                step += 1
                if (self.cfg.profile_dir
                        and step == self.cfg.profile_start_step
                        + self.cfg.profile_n_steps):
                    jax.block_until_ready(metrics["loss"])
                    jax.profiler.stop_trace()
                    print(f"profiler trace in {self.cfg.profile_dir}")
                if post_step(state, metrics, step - 1, step, 1):
                    return state
        return state

    def _megastep_k(self, dm) -> int:
        """Resolve the effective megastep group size: configured K whenever
        a device featurizer exists and the (global) batch divides the data
        axis; 1 (per-batch dispatch) otherwise.

        Meshes compose: stacked (K, B, ...) groups are laid out with the
        batch dim on the `data` axis (prefetch_stacked_groups sharding) and
        multi-host runs emit globally agreeing K-runs from the loader's
        shape-grouped schedule, so the megastep scan is one SPMD program on
        any data×model mesh."""
        k = int(self.cfg.megastep_k)
        if k <= 1 or getattr(dm, "featurizer", None) is None:
            return 1
        if self.mesh is not None:
            n_data = self.mesh.shape[pmesh.DATA_AXIS]
            B_global = dm.batch_size * jax.process_count()
            if B_global % n_data != 0:
                print(f"megastep_k > 1 ignored: global batch {B_global} "
                      f"is not divisible by the data axis ({n_data})")
                return 1
        return k

    def _fit_loop_mega(self, dm, state, rng, step, k, post_step):
        """Megastep epochs: K same-shape raw batches -> one dispatch.

        The loader yields RAW host collations (featurizer=None) scheduled
        into same-shape runs of K (shape_runs); prefetch_stacked_groups
        stacks each run and issues the host->device transfer from a daemon
        thread so the upload rides under the previous group's compute.
        Whole groups run through make_train_megastep; partial groups
        (shape change, epoch tail) and groups that would straddle a phase
        boundary (binarize/KL flags must be static per executable) are
        unstacked on device and fall back to per-batch steps."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from radmmm_tpu.data.loader import DataLoader, prefetch_stacked_groups
        feat = dm.featurizer
        loader = DataLoader(dm.trainset, dm.batch_size, shuffle=True,
                            featurizer=None, num_threads=dm.num_threads,
                            prefetch=max(2, k), seed=dm.seed,
                            hop_length=feat.hop_length, shape_runs=k)
        # stacked (K, B, ...) groups ride the mesh with batch on `data`
        group_sharding = (NamedSharding(self.mesh, P(None, pmesh.DATA_AXIS))
                          if self.mesh is not None else None)

        def mega_fn(binarize, kl_on):
            key = ("mega", binarize, kl_on)
            if key not in self._step_cache:
                fn = make_train_megastep(
                    self.model, self.loss_cfg, self.tx, feat,
                    binarize=binarize, kl_on=kl_on,
                    sync_bn=self.cfg.use_syncbnorm)
                self._step_cache[key] = jax.jit(fn, donate_argnums=0)
            return self._step_cache[key]

        def single(state, raw, key):
            binarize, kl_on = phase_flags(step, self.loss_cfg)
            # same (seed, process, step)-keyed noise stream as the megastep
            # scan, so fallback steps don't fork the augmentation sequence
            batch = feat.featurize_raw(raw, feat.noise_key_for_step(step))
            return self._train_step_fn(binarize, kl_on)(state, batch, key)

        for epoch in range(self.cfg.max_epochs):
            for n, stacked, _ in prefetch_stacked_groups(
                    loader, feat, k, sharding=group_sharding):
                flags = phase_flags(step, self.loss_cfg)
                whole = (n == k
                         and flags == phase_flags(step + k - 1,
                                                  self.loss_cfg)
                         and step + k <= self.cfg.max_steps)
                rng, sub = jax.random.split(rng)
                prev = step
                if whole:
                    state, metrics = mega_fn(*flags)(state, stacked, sub)
                    step += k
                    if post_step(state, metrics, prev, step, k):
                        return state
                else:
                    for i in range(n):
                        raw = jax.tree.map(lambda x, i=i: x[i], stacked)
                        rng, sub = jax.random.split(rng)
                        state, metrics = single(state, raw, sub)
                        step += 1
                        if post_step(state, metrics, step - 1, step, 1):
                            return state
        return state

    # ------------------------------------------------------------------
    def validate(self, state: TrainState, dm, val_step, step: int):
        agg: Dict[str, list] = {}
        loader = dm.val_dataloader()
        first = None
        for batch in loader:
            bd = self._put_batch(batch, train=False)
            if bd is None:
                continue
            metrics = val_step(state, bd)
            for k, v in metrics.items():
                agg.setdefault(k, []).append(float(v))
            if first is None:
                first = batch
        if agg:
            self.logger.scalars(
                "val", {k: float(np.mean(v)) for k, v in agg.items()}, step)
        if first is not None and self.cfg.log_decoder_samples:
            self._log_val_samples(state, first, step)
        if self.cfg.val_prompts_path:
            self._log_tts_samples(state, dm, step)
        self.logger.flush()

    def _log_tts_samples(self, state: TrainState, dm, step: int,
                         max_prompts: int = 4):
        """Synthesize fixed prompts end-to-end and log the audio."""
        from radmmm_tpu.data.dataset import TextOnlyData
        if not hasattr(self, "_tts_prompts"):
            tod = TextOnlyData(self.cfg.val_prompts_path, dm.tp,
                               dm.trainset.speaker_ids,
                               dm.trainset.accent_ids)
            self._tts_prompts = [tod[i]
                                 for i in range(min(len(tod), max_prompts))]
        items = self._tts_prompts
        # config check: flax submodules aren't attributes outside apply()
        if not items or self.model.config.duration_predictor is None:
            return
        batch = self._predict_batch(items)
        infer = self._jitted("tts_infer", lambda: functools.partial(
            self.model.apply, sigma=self.cfg.sigma_infer,
            max_frames=self.cfg.max_infer_frames, method=TTSModel.infer))
        out = infer(
            state.model_variables(), jax.random.key(self.cfg.seed),
            batch["text"], batch["text_lens"], batch["spk_id"],
            accent_ids=batch["accent_id"],
            f0_mean=batch["speaker_f0_mean"],
            f0_std=batch["speaker_f0_std"])
        audio = self._vocode(out["mel"])
        lens = np.asarray(out["lens"].lengths)
        for i, item in enumerate(items):
            wav = np.asarray(audio)[i][: lens[i] * self.cfg.hop_length]
            self.logger.audio(f"val/tts_sample_{i}", wav, step,
                              self.cfg.sampling_rate)
            self.logger.image(
                f"val/tts_mel_{i}",
                plot_mel_to_numpy(np.asarray(out["mel"])[i, :lens[i]]),
                step)

    def _log_val_samples(self, state: TrainState, batch, step: int):
        """Attention images + reconstruction audio
        (LogDecoderSamplesCallback, training_callbacks.py:36-210)."""
        if self.mesh is not None:
            # replicate the sample batch: outputs stay fully addressable on
            # every process, so the host-side plotting below works on
            # multi-host too (the metrics val path stays batch-sharded).
            # Replicated global arrays must hold IDENTICAL values on every
            # process; each process's loader yields a *different* (same-
            # shaped) local batch, so broadcast rank 0's batch first and
            # plot from the broadcast copy.
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils
                batch = multihost_utils.broadcast_one_to_all(
                    jax.tree.map(np.asarray, device_batch(batch)))
            batch_dev = jax.device_put(device_batch(batch),
                                       pmesh.replicated(self.mesh))
        else:
            batch_dev = self._put_batch(batch, train=False)
        if batch_dev is None:
            return
        fwd = self._jitted("val_forward", lambda: functools.partial(
            self.model.apply, binarize=True, train=False, mutable=False))
        outputs = fwd(state.model_variables(), batch_dev)
        attn = np.asarray(outputs["attn"])[0]
        attn_soft = np.asarray(outputs["attn_soft"])[0]
        in_len = int(batch["input_lengths"][0])
        out_len = int(batch["output_lengths"][0])
        self.logger.image("val/attention_hard",
                          plot_alignment_to_numpy(
                              attn[:out_len, :in_len]), step)
        self.logger.image("val/attention_soft",
                          plot_alignment_to_numpy(
                              attn_soft[:out_len, :in_len]), step)
        self.logger.image("val/mel_gt",
                          plot_mel_to_numpy(
                              np.asarray(batch["mel"])[0, :out_len]), step)
        # F0 / energy / voiced gt-vs-pred curves
        # (LogAttributeSamplesCallback, training_callbacks.py:90-210)
        curves = {}
        for key, name in (("f0_outputs", "f0"),
                          ("energy_outputs", "energy"),
                          ("voiced_outputs", "voiced")):
            if key in outputs:
                o = outputs[key]
                gt = np.asarray(o["x"])[0, :out_len, 0]
                pred = np.asarray(o["x_hat"])[0, :out_len, 0]
                if name == "voiced":   # logits -> probability
                    pred = 1.0 / (1.0 + np.exp(-pred))
                curves[f"{name}_gt"] = gt
                curves[f"{name}_pred"] = pred
        if curves:
            self.logger.image("val/attributes",
                              plot_curves_to_numpy(curves), step)
        # reconstruction (analysis-synthesis) sample
        rec_fn = self._jitted("reconstruct", lambda: functools.partial(
            self.model.apply, method=TTSModel.reconstruct))
        rec = rec_fn(state.model_variables(), jax.random.key(0), batch_dev)
        mel_rec = np.asarray(rec["mel"])[0, :out_len]
        self.logger.image("val/mel_reconstructed",
                          plot_mel_to_numpy(mel_rec), step)
        # objective quality scalars over the whole sample batch: MCD of the
        # flow reconstruction + attribute F0 RMSE / voicing F1. A subtly
        # broken flow inverse or predictor moves these by orders of
        # magnitude where loss curves barely flinch (utils/quality.py).
        from radmmm_tpu.utils.quality import reconstruction_quality
        self.logger.scalars(
            "val", reconstruction_quality(
                jax.tree.map(np.asarray, device_batch(batch)),
                np.asarray(rec["mel"]), outputs), step)
        audio = self._vocode(rec["mel"][:1])
        if audio is not None:
            self.logger.audio("val/reconstruction",
                              np.asarray(audio)[0],
                              step, self.cfg.sampling_rate)

    # ------------------------------------------------------------------
    def _vocode(self, mels):
        if not hasattr(self, "_vocoder"):
            voc_fn, denoiser = get_vocoder(
                self.cfg.vocoder_type, self.cfg.vocoder_config_path,
                self.cfg.vocoder_checkpoint_path)
            if voc_fn is None:
                print("no vocoder checkpoint configured — validation audio "
                      f"uses griffin-lim ({self.cfg.griffin_lim_iters} "
                      "iters; set trainer.griffin_lim_iters / "
                      "vocoder_checkpoint_path)")
                gl = GriffinLimVocoder(
                    sampling_rate=self.cfg.sampling_rate,
                    hop_length=self.cfg.hop_length,
                    n_mel_channels=self.model.config.n_mel_channels,
                    n_iters=self.cfg.griffin_lim_iters)
                voc_fn, denoiser = gl, None
                self._vocoder_is_gl = True
            else:
                self._vocoder_is_gl = False
            self._vocoder = (voc_fn, denoiser)
        voc_fn, denoiser = self._vocoder
        if self._vocoder_is_gl:
            return voc_fn(mels)
        return get_audio_for_mels(mels, self.cfg.vocoder_type, voc_fn,
                                  denoiser)

    def predict(self, dm, state: Optional[TrainState] = None):
        """TTS / reconstruction prediction -> wav files
        (TTSModel.forward predict path, tts_lightning_modules.py:585-606)."""
        if self.cfg.predict_mode == "reconstruction":
            return self.predict_reconstruction(dm, state)
        dm.setup("predict")
        out_dir = (self.cfg.prediction_output_dir
                   or os.path.join(self.cfg.output_directory, "predictions"))
        os.makedirs(out_dir, exist_ok=True)

        if state is None:
            items = list(dm.predict_items())
            sample = self._predict_init_batch(items)
            state = self._init_state(sample)
            state, _ = self._restore_state(state, require=True)

        items = list(dm.predict_items())
        batch = self._predict_batch(items)
        infer = self._jitted("predict_infer", lambda: functools.partial(
            self.model.apply, sigma=self.cfg.sigma_infer,
            max_frames=self.cfg.max_infer_frames, method=TTSModel.infer))
        out = infer(
            state.model_variables(), jax.random.key(self.cfg.seed),
            batch["text"], batch["text_lens"], batch["spk_id"],
            decoder_speaker_ids=batch["decoder_spk_id"],
            f0_speaker_ids=batch["f0_spk_id"],
            energy_speaker_ids=batch["energy_spk_id"],
            duration_speaker_ids=batch["duration_spk_id"],
            accent_ids=batch["accent_id"],
            f0_mean=batch["speaker_f0_mean"],
            f0_std=batch["speaker_f0_std"])
        audio = self._vocode(out["mel"])
        lens = np.asarray(out["lens"].lengths)
        hop = self.cfg.hop_length
        paths = []
        if jax.process_index() != 0:     # rank-0 writes on multi-host
            return paths
        for i, item in enumerate(items):
            wav = np.asarray(audio)[i][: lens[i] * hop]
            path = os.path.join(
                out_dir, f"output_sample_{item['idx']}_"
                f"{self.cfg.predict_mode}.wav")
            wavfile.write(path, self.cfg.sampling_rate,
                          (np.clip(wav, -1, 1) * 32767).astype(np.int16))
            paths.append(path)
        print(f"predictions saved to {out_dir}")
        return paths

    def predict_reconstruction(self, dm, state: Optional[TrainState] = None):
        """Analysis-synthesis / voice cloning: rebuild each utterance's mel
        from GT attributes + MAS durations, then vocode
        (reconstruct_from_batch_attributes,
        tts_lightning_modules.py:389-437). Voice cloning = change the
        speaker column in the filelist."""
        dm.setup("fit")
        loader = dm.train_dataloader()
        out_dir = (self.cfg.prediction_output_dir
                   or os.path.join(self.cfg.output_directory, "predictions"))
        os.makedirs(out_dir, exist_ok=True)
        if state is None:
            first = next(iter(loader))
            state = self._init_state(first)
            state, _ = self._restore_state(state, require=True)
        hop = self.cfg.hop_length
        paths = []
        rec_fn = self._jitted("reconstruct", lambda: functools.partial(
            self.model.apply, method=TTSModel.reconstruct))
        for batch in loader:
            rec = rec_fn(state.model_variables(),
                         jax.random.key(self.cfg.seed),
                         device_batch(batch))
            audio = self._vocode(rec["mel"])
            lens = np.asarray(rec["lens"].lengths)
            if jax.process_index() != 0:
                continue
            for i in range(len(lens)):
                wav = np.asarray(audio)[i][: lens[i] * hop]
                path = os.path.join(
                    out_dir,
                    f"output_sample_{int(batch['idx'][i])}_"
                    f"reconstruction.wav")
                wavfile.write(path, self.cfg.sampling_rate,
                              (np.clip(wav, -1, 1) * 32767).astype(np.int16))
                paths.append(path)
        print(f"predictions saved to {out_dir}")
        return paths

    def _predict_batch(self, items):
        B = len(items)
        T = max(len(x["text_encoded"]) for x in items)
        text = np.zeros((B, T), np.int32)
        for i, x in enumerate(items):
            text[i, :len(x["text_encoded"])] = x["text_encoded"]
        def arr(key, dtype=np.int32):
            return jnp.asarray(np.array([x[key] for x in items], dtype))
        return {
            "text": jnp.asarray(text),
            "text_lens": jnp.asarray(
                np.array([len(x["text_encoded"]) for x in items], np.int32)),
            "spk_id": arr("spk_id"),
            "decoder_spk_id": arr("decoder_spk_id"),
            "duration_spk_id": arr("duration_spk_id"),
            "f0_spk_id": arr("f0_spk_id"),
            "energy_spk_id": arr("energy_spk_id"),
            "accent_id": arr("accent_id"),
            "speaker_f0_mean": arr("speaker_f0_mean", np.float32),
            "speaker_f0_std": arr("speaker_f0_std", np.float32),
        }

    def export(self, path: str, batch_size: int = 8, max_text: int = 96,
               use_vocoder: bool = True, buckets=None, frame_buckets=None,
               state: Optional[TrainState] = None) -> int:
        """AOT-export the trained TTS function to a self-contained serving
        artifact (radmmm_tpu/serving.py). Requires a checkpoint unless a
        live state is given; the HiFi-GAN vocoder is baked in when
        configured."""
        from radmmm_tpu.serving import export_tts

        if state is None:
            state = self._init_state(self._export_init_batch())
            state, _ = self._restore_state(state, require=True)
        vocoder = voc_vars = None
        if (use_vocoder and self.cfg.vocoder_type == "hifigan"
                and self.cfg.vocoder_checkpoint_path
                and os.path.exists(str(self.cfg.vocoder_checkpoint_path))):
            from radmmm_tpu.vocoder.utils import load_hifigan_module
            vocoder, voc_vars = load_hifigan_module(
                self.cfg.vocoder_config_path,
                self.cfg.vocoder_checkpoint_path)
        n = export_tts(self.model, state.model_variables(), path,
                       batch_size=batch_size, max_text=max_text,
                       sigma=self.cfg.sigma_infer,
                       max_frames=self.cfg.max_infer_frames,
                       vocoder=vocoder, vocoder_vars=voc_vars,
                       buckets=buckets, frame_buckets=frame_buckets)
        kind = "audio" if vocoder else "mel"
        what = (f"{len(buckets)}-bucket {kind}" if buckets else kind)
        if frame_buckets:
            what += f", two-stage x{len(frame_buckets)} frame buckets"
        print(f"exported {what} TTS artifact ({n / 1e6:.1f} MB) to {path}")
        return n

    def _export_init_batch(self):
        """Synthetic batch for param init when exporting from a ckpt."""
        n_mel = self.model.config.n_mel_channels
        return {
            "text": jnp.zeros((1, 16), jnp.int32),
            "input_lengths": jnp.asarray([16], jnp.int32),
            "mel": jnp.zeros((1, 64, n_mel)),
            "output_lengths": jnp.asarray([64], jnp.int32),
            "speaker_ids": jnp.zeros((1,), jnp.int32),
            "accent_ids": jnp.zeros((1,), jnp.int32),
            "f0": jnp.zeros((1, 64)),
            "voiced_mask": jnp.zeros((1, 64)),
            "energy_avg": jnp.zeros((1, 64)),
            "attn_prior": jnp.full((1, 64, 16), 1.0 / 16),
            "speaker_f0_mean": jnp.asarray([5.0], jnp.float32),
            "speaker_f0_std": jnp.asarray([0.3], jnp.float32),
        }

    def _predict_init_batch(self, items):
        """Tiny synthetic batch for param init during predict."""
        batch = self._predict_batch(items[:1])
        B, T_mel = 1, 64
        n_mel = self.model.config.n_mel_channels
        return {
            "text": batch["text"][:1],
            "input_lengths": batch["text_lens"][:1],
            "mel": jnp.zeros((B, T_mel, n_mel)),
            "output_lengths": jnp.asarray([T_mel], jnp.int32),
            "speaker_ids": batch["spk_id"][:1],
            "accent_ids": batch["accent_id"][:1],
            "f0": jnp.zeros((B, T_mel)),
            "voiced_mask": jnp.zeros((B, T_mel)),
            "energy_avg": jnp.zeros((B, T_mel)),
            "attn_prior": jnp.full(
                (B, T_mel, batch["text"].shape[1]),
                1.0 / batch["text"].shape[1]),
            "speaker_f0_mean": batch["speaker_f0_mean"][:1],
            "speaker_f0_std": batch["speaker_f0_std"][:1],
        }
