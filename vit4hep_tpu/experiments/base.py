"""Experiment lifecycle: run management, SPMD training loop, checkpointing.

Keeps the template-method surface of the reference ``BaseExperiment``
(`/root/reference/experiments/base_experiment.py`): subclasses implement
``init_data``, ``_init_dataloader``, ``_batch_loss``-equivalents, ``plot`` etc.
The runtime underneath is redesigned for TPU:

- single process owns all devices; a 2-D (data, model) ``jax.sharding.Mesh``
  replaces NCCL process groups (vit4hep_tpu/parallel/mesh.py);
- the whole update (loss + grad + clipping + skip guards + optax + EMA) is one
  jitted SPMD program (vit4hep_tpu/experiments/train_state.py) with the train
  state donated, so weights never leave the device;
- checkpoints are orbax pytrees in the reference's run-dir layout
  (``runs/<exp>/<run>/models/model_run{idx}``), configs snapshot to
  ``config.yaml`` so ``-cp runs/... warm_start_idx=K`` resume works unchanged;
- metrics go to a JSONL tracker with an mlflow-compatible API
  (vit4hep_tpu/utils/tracking.py).
"""

from __future__ import annotations

import dataclasses
import os
import time
import zipfile
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vit4hep_tpu.experiments import train_state as ts
from vit4hep_tpu.parallel import mesh as mesh_lib
from vit4hep_tpu.utils import tracking
from vit4hep_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from vit4hep_tpu.utils.config import MissingMandatoryValue, instantiate
from vit4hep_tpu.utils.logger import LOGGER, flush_buffered_logs, init_logging
from vit4hep_tpu.utils.misc import count_parameters, flatten_dict, get_dtype
from vit4hep_tpu.utils.tracking import log_mlflow


class BaseExperiment:
    def __init__(self, cfg, rank=0, world_size=1):
        self.cfg = cfg
        self.rank = rank  # kept for API parity; always 0 in single-process SPMD
        self.world_size = world_size

    def __call__(self):
        try:
            self.run_tracked()
        except MissingMandatoryValue as e:
            LOGGER.exception("Tried to access key that is not specified in the config files")
            raise e
        except Exception as e:
            LOGGER.exception("Exiting with error")
            raise e
        finally:
            flush_buffered_logs()

    def run_tracked(self):
        run_name = self._init()
        LOGGER.info(
            f"### Starting experiment {self.cfg.exp_name}/{run_name} "
            f"(jobid={self.cfg.get('jobid')}) ###"
        )
        try:
            self.full_run()
        finally:
            tracking.end_tracking()

    # ------------------------------------------------------------------ setup
    def _init(self):
        run_name = self._init_experiment()
        self._init_directory()
        if self.cfg.use_mlflow:
            tracking.init_tracking(
                str(Path(self.cfg.base_dir) / "runs" / self.cfg.exp_name / "tracking"),
                self.cfg.exp_name,
                run_name,
            )
        init_logging(
            self.cfg.run_dir if self.cfg.save else None,
            run_idx=self.cfg.run_idx,
            rank=self.rank,
            debug=self.cfg.get("debug", False),
        )
        self._init_backend()
        return run_name

    def _init_experiment(self):
        self.warm_start = self.cfg.get("warm_start_idx") is not None
        # pre-force user intent: checkpoint saving is a COLLECTIVE in
        # multi-process runs (orbax syncs all processes; the primary writes),
        # so _save_model must be entered by every rank when the user asked
        # for saving — while all other run-dir writes stay rank-0-only
        self.save_requested = bool(self.cfg.save)
        self.cfg.save = self.cfg.save and self.rank == 0

        if not self.warm_start:
            if self.cfg.get("run_name") is None:
                rnd = np.random.randint(0, 99999)
                run_name = f"{self.cfg.exp_type}_{rnd:05}"
            else:
                run_name = self.cfg.run_name
            run_dir = os.path.join(self.cfg.base_dir, "runs", self.cfg.exp_name, run_name)
            run_idx = 0
            LOGGER.info(f"Creating new experiment {self.cfg.exp_name}/{run_name}")
        else:
            run_name = self.cfg.run_name
            run_idx = self.cfg.run_idx + 1
            LOGGER.info(
                f"Warm-starting from existing experiment "
                f"{self.cfg.exp_name}/{run_name} for run {run_idx}"
            )

        self.cfg.run_idx = run_idx
        if not self.warm_start:
            self.cfg.warm_start_idx = 0
            self.cfg.run_name = run_name
            self.cfg.run_dir = run_dir
        self.cfg.use_mlflow = False if not self.cfg.save else self.cfg.use_mlflow

        seed = self.cfg.get("seed")
        if seed is not None:
            LOGGER.info(f"Using seed {seed}")
            np.random.seed(seed)
            from vit4hep_tpu.data.calochallenge.transforms import seed_transforms

            seed_transforms(seed)
        self.base_key = jax.random.PRNGKey(seed if seed is not None else np.random.randint(2**31))
        return run_name

    def _init_directory(self):
        if not self.cfg.save:
            LOGGER.info("Running with save=False, i.e. no outputs will be saved")
            return
        run_dir = Path(self.cfg.run_dir).resolve()
        if run_dir.exists() and not self.warm_start:
            raise ValueError(f"Experiment in directory {self.cfg.run_dir} already exists. Aborting.")
        os.makedirs(run_dir, exist_ok=True)
        os.makedirs(run_dir / "models", exist_ok=True)

        if self.cfg.get("save_source", False):
            zip_name = run_dir / "source.zip"
            LOGGER.debug(f"Saving source to {zip_name}")
            pkg_root = Path(__file__).resolve().parents[1]
            with zipfile.ZipFile(zip_name, "w", zipfile.ZIP_DEFLATED) as zf:
                for path in pkg_root.rglob("*.py"):
                    zf.write(path, path.relative_to(pkg_root.parent))

    def _init_backend(self):
        self.mesh = mesh_lib.create_mesh(
            num_devices=self.cfg.get("num_devices"),
            model_parallel=self.cfg.get("model_parallel", 1),
        )
        self.dtype = get_dtype(self.cfg.get("dtype", "float32"))
        LOGGER.info(f"Using mesh {dict(self.mesh.shape)} over {jax.devices()[0].platform}")
        LOGGER.info(f"Using dtype {self.dtype}")
        if self.cfg.get("debug", False):
            # anomaly-detection switch: the jax analogue of the reference's
            # torch.autograd.set_detect_anomaly(debug)
            # (reference base_experiment.py:30) — re-runs the op that
            # produced a NaN de-optimized and raises with its location
            jax.config.update("jax_debug_nans", True)
            LOGGER.info("debug: jax_debug_nans enabled (detect-anomaly mode)")

    # ------------------------------------------------------------------ run
    def full_run(self):
        t0 = time.time()

        self.init_physics()
        self.init_model()
        self.init_data()
        self._init_dataloader()
        self._init_loss()

        if self.cfg.save:
            LOGGER.debug(self.cfg.to_yaml())
            self._save_config("config.yaml", to_tracker=True)
            self._save_config(f"config_{self.cfg.run_idx}.yaml")

        # state init (incl. warm-start restore) happens outside the train
        # branch: `train=false plot=true warm_start_idx=K` must be able to
        # sample/evaluate an existing run without retraining
        # (reference base_experiment.py:71-112 loads the model in init_model)
        self._init_optimizer()
        if self.cfg.train:
            self._init_scheduler()
            self.train()
            self._save_model()
            if self.cfg.save and self.cfg.get("plotting", {}) and self.cfg.plotting.get("loss", False):
                self._plot_training_curves()

        if self.cfg.evaluate:
            self.evaluate()

        if self.cfg.plot and self.cfg.save:
            self.plot()

        if self.cfg.get("load_sample"):
            self.eval_sample(self.cfg.load_sample)

        dt = time.time() - t0
        self._log_peak_memory()
        LOGGER.info(
            f"Finished experiment {self.cfg.exp_name}/{self.cfg.run_name} "
            f"after {dt / 60:.2f}min = {dt / 60**2:.2f}h"
        )

    def _log_peak_memory(self):
        """Device peak-memory report at run end (the jax analogue of the
        reference's torch.cuda.max_memory_allocated log,
        base_experiment.py:103-108). The CPU backend reports no memory
        stats; TPU/GPU expose peak_bytes_in_use."""
        for dev in jax.local_devices():
            stats = getattr(dev, "memory_stats", lambda: None)() or {}
            peak = stats.get("peak_bytes_in_use")
            if peak is not None:
                LOGGER.info(
                    f"Peak device memory on {dev}: {peak / 2**30:.3f} GiB"
                )
                log_mlflow(f"peak_memory_gib_dev{dev.id}", peak / 2**30)

    # ------------------------------------------------------------------ model
    def init_model(self):
        self.model = instantiate(self.cfg.model)
        key_init, self.base_key = jax.random.split(self.base_key)
        params = self.model.init_params(key_init)
        self.use_ema = bool(self.cfg.get("ema", False))
        LOGGER.info("Using EMA for validation and eval" if self.use_ema else "Not using EMA")
        num_parameters = count_parameters(params)
        if self.cfg.use_mlflow:
            log_mlflow("num_parameters", float(num_parameters), step=0)
        LOGGER.info(
            f"Instantiated model {type(self.model.net).__name__} "
            f"with {num_parameters} learnable parameters"
        )
        self._init_params = params  # consumed by _init_optimizer

    def _init_optimizer(self):
        self.lr_schedule = ts.make_schedule(self.cfg.training)
        self.tx = ts.make_optimizer(self.cfg.training, self.lr_schedule)
        state = ts.create_train_state(self._init_params, self.tx, self.use_ema)

        if self.warm_start:
            model_path = os.path.join(
                self.cfg.run_dir, "models", f"model_run{self.cfg.warm_start_idx}"
            )
            LOGGER.info(f"Loading model/optimizer/EMA state from {model_path}")
            state = self._restore_state(state, model_path)

        self.state = mesh_lib.shard_state(state, self.mesh)
        del self._init_params

    def _restore_state(self, template, path):
        if not os.path.exists(path) and os.path.exists(path + ".pt"):
            # a run dir produced by the reference torch framework: migrate the
            # weights in place so sampling / fine-tuning just works (this also
            # covers FTMixin._init_optimizer, which calls _restore_state too)
            return self._restore_state_from_torch(template, path + ".pt")
        restored = load_checkpoint(path, target=template)
        return jax.tree.map(lambda t, r: jnp.asarray(r, t.dtype), template, restored)

    def _restore_state_from_torch(self, state, path):
        """Warm-start from a reference (torch) ``model_run<i>.pt`` checkpoint.

        Model weights and EMA shadows are converted (utils/torch_migration.py);
        the optimizer state cannot cross frameworks and starts fresh.
        """
        import torch as _torch

        from vit4hep_tpu.utils import torch_migration as tm

        LOGGER.info(
            f"Migrating reference torch checkpoint {path} "
            "(model + EMA; optimizer state starts fresh)"
        )
        payload = _torch.load(path, map_location="cpu", weights_only=False)
        model_sd = tm.strip_state_dict_prefixes(payload["model"])
        if "CINN" in str(self.cfg.model.get("_target_", "")):
            kind = "cinn"
        else:
            kind = tm.net_kind_from_target(str(self.cfg.model.net._target_))
        if kind == "cinn":
            # FrEIA GraphINN run dir: convert the coupling subnets and inject
            # the checkpoint's permutation indices, then rebuild the model so
            # the flow is the trained one; re-snapshot the config so later
            # orbax resumes reconstruct the same permutations
            coupling = str(self.cfg.model.coupling_block)
            converted, perms = tm.convert_cinn_state_dict(model_sd, coupling)
            variables = {"params": converted}
            self.cfg.model.permutations = perms
            self.model = instantiate(self.cfg.model)
            self._save_config("config.yaml", to_tracker=False)
            self._save_config(f"config_{self.cfg.run_idx}.yaml")
        elif kind == "energy":
            variables, config_patch = tm.convert_energy_state_dict(model_sd)
            # the frozen Gaussian-Fourier time weights are static config here;
            # rebuild the net so its time features match the trained network,
            # and re-snapshot the config so later orbax resumes of this run
            # rebuild the same net (full_run saved config.yaml before this)
            self.cfg.model.net.param.fourier_w = config_patch["fourier_w"]
            self.model = instantiate(self.cfg.model)
            self._save_config("config.yaml", to_tracker=False)
            self._save_config(f"config_{self.cfg.run_idx}.yaml")
        else:
            variables = tm.convert_vit_state_dict(model_sd, vit1d=(kind == "vit1d"))
        params = jax.tree.map(
            lambda t, r: jnp.asarray(r, t.dtype), state.params, variables
        )
        ema_params = state.ema_params
        ema_updates = state.ema_updates
        if self.use_ema and payload.get("ema") is not None:
            ema_vars = tm.convert_ema_state_dict(
                payload["ema"], model_sd, kind,
                coupling_block=str(self.cfg.model.coupling_block)
                if kind == "cinn" else None,
            )
            ema_params = jax.tree.map(
                lambda t, r: jnp.asarray(r, t.dtype), state.ema_params, ema_vars
            )
            ema_updates = jnp.asarray(
                int(payload["ema"].get("num_updates") or 0), jnp.int32
            )
        elif self.use_ema:
            ema_params = jax.tree.map(jnp.copy, params)
        return dataclasses.replace(
            state, params=params, ema_params=ema_params, ema_updates=ema_updates
        )

    def _init_scheduler(self):
        # schedules are folded into the optimizer; ReduceLROnPlateau is host-driven
        self.plateau = None
        if self.cfg.training.get("scheduler") == "ReduceLROnPlateau":
            self.plateau = {
                "factor": float(self.cfg.training.get("reduceplateau_factor", 0.1)),
                "patience": int(self.cfg.training.get("reduceplateau_patience", 10)),
                "best": float("inf"),
                "bad": 0,
            }
        LOGGER.debug(f"Using learning rate scheduler {self.cfg.training.get('scheduler')}")

    # ------------------------------------------------------------------ train
    def _compile_steps(self):
        tcfg = self.cfg.training

        def loss_fn(params, x, c, rng):
            return self.model.batch_loss(params, x, c, rng)

        raw_step = ts.make_train_step(
            loss_fn,
            self.tx,
            clip_grad_value=tcfg.get("clip_grad_value"),
            clip_grad_norm=tcfg.get("clip_grad_norm"),
            max_grad_norm=tcfg.get("max_grad_norm"),
            ema_decay=float(tcfg.get("ema_decay", 0.9999)) if self.use_ema else None,
        )
        self._train_step = jax.jit(raw_step, donate_argnums=(0,))

        def val_loss(params, batch, rng):
            return loss_fn(params, *batch, rng)

        self._val_step = jax.jit(val_loss)

    def _put_batch(self, batch):
        return mesh_lib.shard_batch(batch, self.mesh)

    def _prefetched(self, iterator, depth: int = 2):
        """Assemble + device-put upcoming batches on a background thread so
        host-side data work overlaps with the device executing the current
        step (the jitted step dispatch returns immediately)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)

        def worker():
            # exceptions must reach the consumer — a silently-dead producer
            # leaves the train loop blocked on q.get() forever
            try:
                for item in iterator:
                    q.put(self._put_batch(item))
                q.put(StopIteration())
            except BaseException as exc:  # noqa: BLE001 — re-raised below
                q.put(exc)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if isinstance(item, StopIteration):
                return
            if isinstance(item, BaseException):
                raise item
            yield item

    def train(self):
        self.train_lr, self.train_loss, self.val_loss = [], [], []
        self.grad_norm_train, self.grad_norm_net = [], []

        self._compile_steps()
        smallest_val_loss, smallest_val_loss_step = 1e10, 0
        patience = 0
        tcfg = self.cfg.training
        iterations = int(tcfg.iterations)
        validate_every = int(tcfg.validate_every_n_steps)
        log_every = int(tcfg.get("log_every_n_steps", 0) or 0)

        LOGGER.info(
            f"Starting to train for {iterations} iterations "
            f"= {iterations / self.batches_per_epoch:.1f} epochs "
            f"on a dataset with {self.batches_per_epoch} batches "
            f"using early stopping with patience {tcfg.es_patience} "
            f"while validating every {validate_every} iterations"
        )
        self.training_start_time = time.time()
        train_time, val_time = 0.0, 0.0
        key_train, self.base_key = jax.random.split(self.base_key)

        # optional profiler window (SURVEY.md section 5: trace hook gated by a
        # config flag): capture steps [10, 20) into <run_dir>/profile
        profile_window = (10, 20) if self.cfg.get("profile", False) and self.cfg.save else None

        train_feed = self._prefetched(self.train_iterator)

        step = 0
        pending = []  # (step, metrics) not yet fetched from device
        for step in range(iterations):
            if profile_window and step == profile_window[0]:
                jax.profiler.start_trace(os.path.join(self.cfg.run_dir, "profile"))
            data = next(train_feed)
            t0 = time.time()
            self.state, metrics = self._train_step(
                self.state, data, jax.random.fold_in(key_train, step)
            )
            pending.append((step, metrics))
            train_time += time.time() - t0
            if profile_window and step == profile_window[1]:
                jax.tree.map(lambda x: x.block_until_ready(), metrics)
                jax.profiler.stop_trace()
                LOGGER.info(f"Saved profiler trace to {self.cfg.run_dir}/profile")
                profile_window = None

            validating = (step + 1) % validate_every == 0
            logging_now = (
                log_every and step % log_every == 0
            ) or validating or step in (0, 9, 999)

            if logging_now:
                self._drain_metrics(pending, log_every)
                pending = []

            if validating:
                t0 = time.time()
                val_loss = self._validate(step)
                val_time += time.time() - t0
                if val_loss < smallest_val_loss:
                    smallest_val_loss = val_loss
                    smallest_val_loss_step = step
                    patience = 0
                    if tcfg.get("es_load_best_model", False):
                        self._save_model(
                            f"model_run{self.cfg.run_idx}_it{smallest_val_loss_step}"
                        )
                else:
                    patience += 1
                    if patience > int(tcfg.es_patience):
                        LOGGER.info(
                            f"Early stopping in iteration {step} "
                            f"= epoch {step / self.batches_per_epoch:.1f}"
                        )
                        break
                self._plateau_step(val_loss)

            dt = time.time() - self.training_start_time
            if step in (0, 9, 999) or validating:
                dt_estimate = dt * iterations / (step + 1)
                # include the loss so a run without mlflow/JSONL tracking
                # still shows training progress in the plain log
                loss_str = (
                    f", val loss {val_loss:.5f}" if validating
                    else f", train loss {float(metrics['loss']):.5f}"
                    if "loss" in metrics else ""
                )
                LOGGER.info(
                    f"Finished iteration {step + 1} after {dt:.2f}s, "
                    f"training time estimate: {dt_estimate / 60:.2f}min "
                    f"= {dt_estimate / 60**2:.2f}h{loss_str}"
                )

        # the trace must be closed even when the loop exits inside the window
        # (early stop, or iterations <= window end) or the profile never writes
        if profile_window and step >= profile_window[0]:
            jax.profiler.stop_trace()
            LOGGER.info(f"Saved profiler trace to {self.cfg.run_dir}/profile")

        self._drain_metrics(pending, log_every)
        dt = time.time() - self.training_start_time
        LOGGER.info(
            f"Finished training for {step} iterations "
            f"= {step / self.batches_per_epoch:.1f} epochs "
            f"after {dt / 60:.2f}min = {dt / 60**2:.2f}h"
        )
        LOGGER.info(f"Spend {train_time:.2f}s training and {val_time:.2f}s validating")
        if self.cfg.use_mlflow:
            log_mlflow("iterations", step)
            log_mlflow("epochs", step / self.batches_per_epoch)
            log_mlflow("traintime", dt / 3600)

        if tcfg.get("es_load_best_model", False):
            model_path = os.path.join(
                self.cfg.run_dir,
                "models",
                f"model_run{self.cfg.run_idx}_it{smallest_val_loss_step}",
            )
            try:
                self.state = mesh_lib.shard_state(
                    self._restore_state(self.state, model_path), self.mesh
                )
                LOGGER.info(f"Loading model from {model_path}")
            except FileNotFoundError:
                LOGGER.warning(
                    f"Cannot load best model (it {smallest_val_loss_step}) from {model_path}"
                )

    def _drain_metrics(self, pending, log_every):
        """Fetch queued device metrics; log the cadence steps to the tracker."""
        for s, m in pending:
            loss = float(m["loss"])
            grad_norm = float(m["grad_norm"])
            if int(m["skipped"]):
                LOGGER.warning(f"Skipped update at step {s} (grad norm {grad_norm:.3g})")
            lr = float(self.lr_schedule(s)) * float(self.state.lr_scale)
            self.train_loss.append(loss)
            self.train_lr.append(lr)
            self.grad_norm_train.append(grad_norm)
            self.grad_norm_net.append(float(m["grad_norm_net"]))
            if self.cfg.use_mlflow and log_every and s % log_every == 0:
                log_dict = {
                    "loss": loss,
                    "lr": lr,
                    "time_per_step": (time.time() - self.training_start_time) / (s + 1),
                    "grad_norm": grad_norm,
                    "grad_norm_net": self.grad_norm_net[-1],
                }
                for key, value in log_dict.items():
                    log_mlflow(f"train.{key}", value, step=s)

    def _plateau_step(self, val_loss):
        if self.plateau is None:
            return
        # torch ReduceLROnPlateau default: improvement only counts when
        # val_loss < best * (1 - threshold), threshold 1e-4 (mode 'rel')
        if val_loss < self.plateau["best"] * (1.0 - 1e-4):
            self.plateau["best"] = val_loss
            self.plateau["bad"] = 0
        else:
            self.plateau["bad"] += 1
            if self.plateau["bad"] > self.plateau["patience"]:
                new_scale = self.state.lr_scale * self.plateau["factor"]
                self.state = self.state.replace(lr_scale=new_scale)
                self.plateau["bad"] = 0
                LOGGER.info(f"ReduceLROnPlateau: lr scale -> {float(new_scale):.3g}")

    def _validate(self, step):
        params = self.eval_params()
        key_val, self.base_key = jax.random.split(self.base_key)
        losses = []
        for i, batch in enumerate(self.val_batches()):
            batch = self._put_batch(batch)
            losses.append(
                self._val_step(params, batch, jax.random.fold_in(key_val, i))
            )
        val_loss = float(np.mean([float(x) for x in losses]))
        self.val_loss.append(val_loss)
        if self.cfg.use_mlflow:
            log_mlflow("val.loss", val_loss, step=step)
        return val_loss

    def eval_params(self):
        """EMA params when enabled, else current params (reference uses
        ema.average_parameters() for validation/eval)."""
        return self.state.ema_params if self.use_ema else self.state.params

    # ------------------------------------------------------------------ io
    def _save_config(self, filename, to_tracker=False):
        if not self.cfg.save:
            return
        config_filename = Path(self.cfg.run_dir) / filename
        LOGGER.debug(f"Saving config at {config_filename}")
        with open(config_filename, "w", encoding="utf-8") as f:
            f.write(self.cfg.to_yaml())
        if to_tracker and self.cfg.use_mlflow:
            for key, value in flatten_dict(self.cfg.to_container(resolve=False)).items():
                log_mlflow(key, value, kind="param")

    def _plot_training_curves(self):
        """Loss / LR / grad-norm PDFs into the run dir (reference
        experiments/base_plots.py via base_experiment plotting hooks)."""
        from vit4hep_tpu.utils.base_plots import plot_loss, plot_metric

        run_dir = Path(self.cfg.run_dir)
        val_every = int(self.cfg.training.validate_every_n_steps)
        if self.train_loss:
            plot_loss(run_dir / f"loss_{self.cfg.run_idx}.pdf", self.train_loss,
                      self.val_loss, val_every=val_every)
        if self.train_lr:
            plot_metric(run_dir / f"lr_{self.cfg.run_idx}.pdf", self.train_lr,
                        "learning rate", logy=True)
        if self.grad_norm_train:
            plot_metric(run_dir / f"grad_norm_{self.cfg.run_idx}.pdf",
                        self.grad_norm_train, "gradient norm", logy=True)

    def _save_model(self, filename=None):
        # multi-process: every rank must enter (orbax save syncs globally —
        # a rank-0-only call deadlocks on its internal barrier; found by
        # tests/test_distributed_e2e.py). Call sites are rank-symmetric
        # (val-loss decisions are identical across ranks under SPMD).
        multiproc = jax.process_count() > 1
        if not (self.cfg.save or (multiproc and self.save_requested)):
            return
        if filename is None:
            filename = f"model_run{self.cfg.run_idx}"
        model_path = os.path.join(self.cfg.run_dir, "models", filename)
        LOGGER.debug(f"Saving model at {model_path}")
        save_checkpoint(model_path, self.state)

    # ------------------------------------------------------------------ abstract
    def init_physics(self):
        raise NotImplementedError

    def init_data(self):
        raise NotImplementedError

    def evaluate(self):
        raise NotImplementedError

    def plot(self):
        raise NotImplementedError

    def eval_sample(self, dirname=""):
        raise NotImplementedError

    def _init_dataloader(self):
        raise NotImplementedError

    def _init_loss(self):
        raise NotImplementedError

    def val_batches(self):
        raise NotImplementedError
