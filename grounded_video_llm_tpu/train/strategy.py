"""Training strategy: the epoch/step loop, stage setup, checkpoint/resume.

Replaces reference training/base_strategy.py + training/fsdp.py:
  run_setup     — stage features (vocab expansion, LoRA attach), per-group
                  optimizer, FSDP sharding onto the mesh
  run_training  — epoch loop over the resumable loader, jitted step, NaN
                  abort (base_strategy.py:284-286), metrics push (wired,
                  unlike the reference's commented-out trackers)
  save/resume   — orbax train-state + loader snapshot; trainable-only
                  reference-format .pth export for interop (fsdp.py:98-127)
"""

from __future__ import annotations

import math
import os
from typing import Dict, Optional

import jax
import numpy as np

from ..core import checkpoint as ckpt
from ..core.config import STAGE_PRESETS, NUM_SPECIAL_TOKENS, VLMConfig
from ..data.collate import collate
from ..data.loader import DataLoader
from ..models import vlm
from ..obs.logger import initialize_overwatch
from ..obs.trackers import Metrics
from ..parallel.mesh import build_mesh
from . import lora as lora_mod
from .optimizer import make_optimizer
from .step import TrainState, create_train_state, make_train_step, shard_batch
from .vocab import expand_vocab


class TrainingStrategy:
    def __init__(
        self,
        cfg: VLMConfig,
        stage_name: str,
        params: Dict,
        tokenizer,
        run_dir: str = "runs/default",
        mesh=None,
        n_train_examples: int = 0,
        seed: int = 42,
        wandb_project: Optional[str] = None,
    ):
        self.cfg = cfg
        self.stage = STAGE_PRESETS[stage_name]
        self.tokenizer = tokenizer
        self.run_dir = run_dir
        self.seed = seed
        self.overwatch = initialize_overwatch()
        self.mesh = mesh if mesh is not None else build_mesh()
        os.makedirs(run_dir, exist_ok=True)

        n_devices = int(np.prod(self.mesh.devices.shape))
        world = max(jax.process_count(), 1)
        per_step_batch = self.stage.per_device_batch_size * n_devices
        assert self.stage.global_batch_size % per_step_batch == 0, (
            "global batch must divide evenly (reference "
            "base_strategy.py:83-86)")
        self.grad_accum = self.stage.global_batch_size // per_step_batch
        self.steps_per_epoch = (
            n_train_examples // self.stage.global_batch_size
            if n_train_examples else 0)
        total_steps = max(self.steps_per_epoch * self.stage.epochs, 1)

        # stage features
        if self.stage.expand_vocab and (
                params["llm"]["embed"].shape[0]
                == cfg.llm.vocab_size):
            params["llm"] = expand_vocab(params["llm"], NUM_SPECIAL_TOKENS)
        if self.stage.lora and "lora" not in params["llm"]["layers"]:
            params["llm"] = lora_mod.attach_lora(
                params["llm"],
                lora_mod.init_lora(jax.random.key(seed), cfg.llm))

        self.tx, self.labels = make_optimizer(self.stage, total_steps, params)
        # schedule mirror for lr reporting (reference logs scheduler lr)
        import optax

        warmup = max(int(total_steps * self.stage.warmup_ratio), 1)
        self._lr_schedule = optax.warmup_cosine_decay_schedule(
            0.0, self.stage.lr_llm or self.stage.lr_video_projector, warmup,
            max(total_steps, warmup + 1), 0.0)
        self.state = create_train_state(params, self.tx, mesh=self.mesh)
        from .optimizer import trainable_mask as _tm

        self.step_fn = make_train_step(cfg, self.tx,
                                       grad_accum=self.grad_accum, remat=True,
                                       trainable_mask=_tm(self.labels),
                                       lora_dropout=self.stage.lora_dropout,
                                       dropout_seed=seed, mesh=self.mesh)
        self.metrics = Metrics(
            run_id=f"{stage_name}-{cfg.llm_name}", run_dir=run_dir,
            hparams={"stage": stage_name, "llm": cfg.llm_name,
                     "global_batch": self.stage.global_batch_size,
                     "grad_accum": self.grad_accum,
                     "total_steps": total_steps},
            wandb_project=wandb_project)
        self.total_steps = total_steps

    # ------------------------------------------------------------------

    def make_loader(self, dataset) -> DataLoader:
        micro_bs = (self.stage.per_device_batch_size
                    * int(np.prod(self.mesh.devices.shape)))
        return DataLoader(
            dataset,
            collate_fn=lambda samples: collate(
                samples, self.tokenizer,
                __import__("grounded_video_llm_tpu.text.templates",
                           fromlist=["get_template"]).get_template(
                               self.cfg.llm_name),
                max_txt_len=self.stage.max_txt_len),
            batch_size=micro_bs * self.grad_accum,
            shuffle=True, seed=self.seed,
            num_shards=max(jax.process_count(), 1),
            shard_id=jax.process_index())

    def _device_batch(self, host_batch: vlm.Batch) -> vlm.Batch:
        if self.grad_accum > 1:
            micro = host_batch.input_ids.shape[0] // self.grad_accum

            def split(x):
                return x.reshape(self.grad_accum, micro, *x.shape[1:])

            host_batch = jax.tree_util.tree_map(split, host_batch)
        return shard_batch(host_batch, self.mesh, grad_accum=self.grad_accum)

    # ------------------------------------------------------------------

    def run_training(self, dataset, resume_from: Optional[str] = None,
                     resume_interval: float = 0.1) -> None:
        """resume_interval: save a resume bundle this fraction of an epoch
        (the reference's --resume_interval; its in-loop trigger was commented
        out — base_strategy.py:347-355 — here it is wired)."""
        loader = self.make_loader(dataset)
        if resume_from:
            self.load_resume(resume_from, loader)

        self._loss_history = []
        save_every = max(int(self.steps_per_epoch * resume_interval), 1) \
            if self.steps_per_epoch else 0

        for epoch in range(loader.epoch, self.stage.epochs):
            self.overwatch.info(f"epoch {epoch}")
            for host_batch in loader.epoch_iterator():
                batch = self._device_batch(host_batch)
                self.state, m = self.step_fn(self.state, batch)
                loss = float(m["loss"])
                if math.isnan(loss):
                    raise RuntimeError(
                        "NaN loss encountered — aborting (parity with "
                        "reference base_strategy.py:284-286)")
                self.metrics.commit(loss)
                self._loss_history.append(loss)
                lr = float(self._lr_schedule(self.metrics.global_step))
                status = self.metrics.push(lr=lr,
                                           extra={"grad_norm":
                                                  float(m["grad_norm"])})
                if self.metrics.global_step % 10 == 0:
                    self.overwatch.info(status)
                if save_every and self.metrics.global_step % save_every == 0:
                    self.save_checkpoint("latest", loader, block=False)
                    self.plot_loss()
        ckpt.wait_for_saves()

    def plot_loss(self) -> None:
        """Loss-curve jpg (reference base_strategy.py:104-116, dumped every
        ~1% of an epoch)."""
        if not getattr(self, "_loss_history", None):
            return
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            plt.figure(figsize=(8, 4))
            plt.plot(self._loss_history)
            plt.xlabel("step")
            plt.ylabel("loss")
            plt.tight_layout()
            plt.savefig(os.path.join(self.run_dir, "loss_curve.jpg"))
            plt.close()
        except Exception:
            pass

    # ------------------------------------------------------------------
    # Checkpointing

    def save_checkpoint(self, tag: str = "latest",
                        loader: Optional[DataLoader] = None,
                        block: bool = True) -> str:
        """block=False dispatches the orbax save to its background writer so
        training overlaps the multi-GB serialization (the in-loop interval
        saves use it); run_training waits out any in-flight save at the end,
        and load_resume/readers must only run after wait_for_saves()."""
        path = os.path.join(self.run_dir, f"state_{tag}")
        tree = {"params": self.state.params,
                "opt_state": self.state.opt_state,
                "step": self.state.step}
        if block:
            ckpt.save_pytree(path, tree)
        else:
            ckpt.save_pytree_async(path, tree)
        if loader is not None:
            ckpt.save_json(os.path.join(self.run_dir, f"loader_{tag}.json"),
                           loader.state_dict())
        return path

    def load_resume(self, path: str, loader: DataLoader) -> None:
        ckpt.wait_for_saves()   # an async interval save may still be writing
        restored = ckpt.load_pytree(path, template={
            "params": self.state.params, "opt_state": self.state.opt_state,
            "step": self.state.step})
        self.state = TrainState(restored["params"], restored["opt_state"],
                                restored["step"])
        loader_json = os.path.join(os.path.dirname(path),
                                   "loader_latest.json")
        if os.path.exists(loader_json):
            loader.load_state_dict(ckpt.load_json(loader_json))

    def export_reference_checkpoint(self, path: str,
                                    trainable_only: bool = True) -> None:
        """Trainable-only split-by-module export in the reference's .pth
        layout (fsdp.py:116-127) for cross-framework weight exchange."""
        from ..models import export as export_mod

        export_mod.export_vlm_to_reference(self.state.params, self.cfg, path,
                                           trainable_only=trainable_only)
