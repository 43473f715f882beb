"""Trainer shell: epoch loop, early stopping, four-role checkpointing,
CSV logging, periodic metric testing.

Behavioral mirror of the reference driver (train.py:207-716) rebuilt around
jit-compiled steps and host-side orchestration:

- dataset load (6-pickle layout) + normalization (train.py:226-424)
- epoch loop with early stopping: run while ``worse_epochs < patience or
  epoch < min_n_epochs`` (train.py:538)
- per-epoch validation; StepLR with min-lr gate (train.py:570-571)
- four checkpoint roles: ``checkpoint`` (latest), ``checkpoint_best_model``,
  ``checkpoint_best_model_of_checkpoint`` (2nd-best bookkeeping),
  ``checkpoint_best_model_on_Test`` (train.py:577-616, 658-669)
- per-epoch ``<name>_training_metrics.csv`` row and per-test
  ``<name>_test_metrics.csv`` 16-column row (train.py:620-621, 634-643)
- periodic test every ``test_step`` epochs with ``test_mode='test_best'``
  semantics: evaluate the best-so-far weights, track best Global-SELD
  (train.py:628-674)
- archival snapshot dirs every ``checkpoint_step`` epochs (train.py:676-688)
- final: reload best-on-test, losses on all splits, results dict (true JSON —
  the reference np.save's an .npy to a .json path), final test
  (train.py:692-716)
"""

from __future__ import annotations

import json
import os
import sys
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from seld_tpu.data.loader import BatchIterator, load_task2_pickles, make_loaders
from seld_tpu.data.normalize import normalize_dataset
from seld_tpu.metrics import (
    SELDMetrics,
    gen_submission_list_task2,
    location_sensitive_detection,
    segment_labels,
)
from seld_tpu.models import model_from_config
from seld_tpu.parallel.mesh import make_mesh, shard_batch, shard_variables
from seld_tpu.training.checkpoint import archive_checkpoints, load_checkpoint, save_checkpoint
from seld_tpu.training.loss import seld_loss
from seld_tpu.training.schedule import schedule_from_config
from seld_tpu.training.steps import (
    create_train_state,
    make_infer_step,
    make_train_step,
    set_learning_rate,
)
from seld_tpu.utils.io import save_array_to_csv
from seld_tpu.utils.profiling import MetricsLogger, StepTimer


def evaluate_test_outputs(
    sed: np.ndarray,
    doa: np.ndarray,
    target: np.ndarray,
    eval_metrics: SELDMetrics,
    cfg,
) -> tuple:
    """Per-clip metric update; returns (tp, fp, fn). Mirrors train.py:96-127."""
    n_sed = int(cfg.output_classes * cfg.class_overlaps)
    sed_t, doa_t = target[:, :n_sed], target[:, n_sed:]
    prediction, prediction_dict = gen_submission_list_task2(
        sed, doa, max_overlaps=int(cfg.class_overlaps), max_loc_value=cfg.max_loc_value,
        num_classes=cfg.output_classes,
    )
    truth, truth_dict = gen_submission_list_task2(
        sed_t, doa_t, max_overlaps=int(cfg.class_overlaps), max_loc_value=cfg.max_loc_value,
        num_classes=cfg.output_classes,
    )
    eval_metrics.update_seld_scores(
        segment_labels(prediction_dict, cfg.num_frames),
        segment_labels(truth_dict, cfg.num_frames),
    )
    tp, fp, fn, _ = location_sensitive_detection(
        prediction, truth, cfg.num_frames, cfg.spatial_threshold, False
    )
    return tp, fp, fn


class Trainer:
    """Config-driven trainer (the ``train.py --TextArgs=...`` engine)."""

    def __init__(self, cfg, verbose: bool = True):
        self.cfg = cfg
        self.verbose = verbose
        self.model = model_from_config(cfg)
        self.np_rng = np.random.default_rng(1 if cfg.fixed_seed else None)
        n_dev = jax.device_count()
        n_model = max(1, cfg.mesh_model)
        n_data = cfg.mesh_data if cfg.mesh_data > 0 else max(1, n_dev // n_model)
        # multihost: jax.devices() is global, so the mesh spans all hosts;
        # loaders shard per host (setup_data) and batches reassemble into
        # global arrays (_device_batch)
        self.n_hosts = jax.process_count()
        self.host_id = jax.process_index()
        self.mesh = make_mesh(n_data, n_model) if n_data * n_model > 1 else None
        self._log_fn = print if verbose else (lambda *a, **k: None)

    # ------------------------------------------------------------------ setup
    def _log(self, *args):
        self._log_fn(*args)

    def setup_data(self):
        cfg = self.cfg
        if str(cfg.training_predictors_path).endswith(".seldpak"):
            # native path: splits stay in the mmap; batches are gathered by
            # the C++ loader and normalized per batch (stats streamed once)
            from seld_tpu.data.loader import make_pak_loaders
            from seld_tpu.data.native import PakReader
            from seld_tpu.data.normalize import compute_norm_stats, make_batch_transform

            self._pak_reader = PakReader(cfg.training_predictors_path)
            norm_args = dict(
                mode=cfg.dataset_normalization, n_mics=cfg.n_mics,
                phase=cfg.phase, domain=cfg.domain,
            )
            transforms = {}
            for split in ("train", "val", "test"):
                x_view, _ = self._pak_reader.split(split)
                transforms[split] = make_batch_transform(
                    stats=compute_norm_stats(x_view, **norm_args), **norm_args
                )
            self.loaders = make_pak_loaders(
                self._pak_reader, cfg.batch_size, seed=1, transforms=transforms,
                num_shards=self.n_hosts, shard_id=self.host_id,
            )
            test_shape = self._pak_reader.shape(self._pak_reader.SPLITS["test"][0])
        else:
            predictors, targets = load_task2_pickles(cfg)
            predictors = normalize_dataset(
                predictors, mode=cfg.dataset_normalization, n_mics=cfg.n_mics,
                phase=cfg.phase, domain=cfg.domain,
            )
            self.loaders = make_loaders(
                predictors, targets, cfg.batch_size, seed=1,
                num_shards=self.n_hosts, shard_id=self.host_id,
            )
            test_shape = predictors["test"].shape
        drop_last = self.mesh is not None and self.mesh.shape["data"] > 1
        if drop_last:
            self.loaders["train"].drop_last = True
        self.n_time_frames = test_shape[-1]
        self.sample_input = jnp.zeros(
            (cfg.batch_size, cfg.input_channels, cfg.freq_dim, self.n_time_frames),
            jnp.float32,
        )

    def setup_model(self, seed: int = 0):
        cfg = self.cfg
        self.state, self.tx = create_train_state(
            self.model, cfg, jax.random.PRNGKey(seed), self.sample_input
        )
        if self.mesh is not None:
            self.state = self.state.replace(
                params=shard_variables(self.mesh, self.state.params),
                batch_stats=shard_variables(self.mesh, self.state.batch_stats),
                opt_state=jax.device_put(self.state.opt_state),
            )
        self.train_step = make_train_step(self.model, self.tx, cfg)
        self.infer_step = make_infer_step(
            self.model, precision="highest" if cfg.compute_dtype == "float32" else "default"
        )
        self.sched = schedule_from_config(cfg)
        n_params = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(self.state.params))
        self._log(f"Model: {self.model.model_name}")
        rf, n_rb = self.model.receptive_field()
        self._log(f"Receptive Field: {rf}  ResBlocks: {n_rb}")
        self._log(f"Total parameters: {n_params}")
        if self.verbose:
            # per-module parameter table + name-field breakdown — the
            # torchinfo.summary / print_model_name surface
            # (reference train.py:483, model.py:519-546)
            from seld_tpu.utils import describe_model_name, model_summary

            for line in describe_model_name(self.model.model_name):
                self._log("  " + line)
            self._log(model_summary(self.state.params, depth=2))
        self.n_params = n_params

    # ------------------------------------------------------------- primitives
    def _device_batch(self, x, y):
        if self.n_hosts > 1:
            from seld_tpu.parallel import multihost

            # global_batch shard-or-replicates: remainder batches whose
            # global row count doesn't divide the 'data' axis are allgathered
            # and replicated (the multihost analogue of the guard below)
            return multihost.global_batch(
                self.mesh, np.asarray(x, np.float32), np.asarray(y, np.float32)
            )
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        if self.mesh is not None and x.shape[0] % self.mesh.shape["data"] == 0:
            x, y = shard_batch(self.mesh, x, y)
        return x, y

    def evaluate(self, loader: BatchIterator) -> float:
        """Mean per-batch loss (reference's running mean == batch mean)."""
        losses = []
        for x, y in loader:
            x, y = self._device_batch(x, y)
            sed, doa = self.infer_step(self.state.params, self.state.batch_stats, x)
            loss = seld_loss(
                sed, doa, y,
                output_classes=self.cfg.output_classes,
                class_overlaps=int(self.cfg.class_overlaps),
                sed_weight=self.cfg.sed_loss_weight,
                doa_weight=self.cfg.doa_loss_weight,
            )
            losses.append(float(loss))
        return float(np.mean(losses)) if losses else float("nan")

    def evaluate_test(self, loader: BatchIterator, epoch: int = 0) -> List[float]:
        """Full metric pass; returns the 16-column results row (train.py:146-148)."""
        cfg = self.cfg
        TP = FP = FN = 0
        eval_metrics = SELDMetrics(
            nb_classes=cfg.output_classes, doa_threshold=cfg.Dcase21_metrics_DOA_threshold
        )
        for x, y in loader:
            xb, _ = self._device_batch(x, y)
            sed, doa = self.infer_step(self.state.params, self.state.batch_stats, xb)
            if self.n_hosts > 1:
                # every host reassembles the full global batch and computes
                # identical metrics (loaders are host-sharded in batch order)
                from seld_tpu.parallel import multihost

                sed = multihost.allgather_rows(multihost.local_rows(sed))
                doa = multihost.allgather_rows(multihost.local_rows(doa))
                y = multihost.allgather_rows(np.asarray(y, np.float32))
            else:
                sed = np.asarray(sed)
                doa = np.asarray(doa)
            for b in range(sed.shape[0]):
                tp, fp, fn = evaluate_test_outputs(
                    sed[b], doa[b], np.asarray(y[b]), eval_metrics, cfg
                )
                TP += tp
                FP += fp
                FN += fn
        eps = sys.float_info.epsilon
        precision = TP / (TP + FP + eps)
        recall = TP / (TP + FN + eps)
        F_score = 2 * precision * recall / (precision + recall + eps)
        Nref, Nsys = TP + FN, TP + FP
        ER_score = (max(Nref, Nsys) - TP) / (Nref + 0.0) if Nref else 0.0
        ER_d, F_d, LE_d, LR_d = eval_metrics.compute_seld_scores()
        SELD_dcase21 = float(np.mean([ER_d, 1 - F_d, LE_d / 180, 1 - LR_d]))
        Global_SELD = float(np.mean([ER_score, 1 - F_score, LE_d / 180, 1 - LR_d]))
        CSL = float(np.mean([LE_d / 180, 1 - LR_d]))
        LSD = float(np.mean([1 - F_score, ER_score]))
        self._log(
            f"TEST epoch {epoch}: Global SELD {Global_SELD:.4f} LSD {LSD:.4f} "
            f"CSL {CSL:.4f} F {F_score:.4f} ER {ER_score:.4f} LE {LE_d:.2f} LR {LR_d:.4f}"
        )
        return [
            epoch, F_score, ER_score, precision, recall, TP, FP, FN,
            CSL, LSD, Global_SELD, SELD_dcase21, ER_d, F_d, LE_d, LR_d,
        ]

    # ------------------------------------------------------------------ train
    def fit(self, max_epochs: Optional[int] = None) -> Dict:
        cfg = self.cfg
        model_dir = os.path.join(
            "RESULTS_Original", "Task2", cfg.architecture,
            self.model.model_name + cfg.model_extra_name,
        )
        os.makedirs(model_dir, exist_ok=True)
        unique_name = os.path.join(model_dir, self.model.model_name + cfg.model_extra_name)
        ckpt = os.path.join(model_dir, "checkpoint")
        ckpt_best = os.path.join(model_dir, "checkpoint_best_model")
        ckpt_best_backup = os.path.join(model_dir, "checkpoint_best_model_of_checkpoint")
        ckpt_best_test = ckpt + "_best_model_on_Test"

        loop = {
            "step": 0, "worse_epochs": 0, "epochs": 0,
            "best_loss": float("inf"), "best_epoch": 0, "best_test_epoch": 0,
        }
        epoch = 0
        best_loss_checkpoint = float("inf")
        best_epoch_checkpoint = 0
        best_test_metric = 1.0
        new_best = False
        test_best_results = [0.0] * 16
        train_hist: List[float] = []
        val_hist: List[float] = []

        # auto-resume from the latest checkpoint, like train.py:467,525-528
        if os.path.isfile(ckpt):
            self._log(f"Resuming from {ckpt}")
            tstate, loop, sched = load_checkpoint(ckpt, self.np_rng)
            self.state = jax.tree_util.tree_map(jnp.asarray, tstate)
            if sched is not None:
                self.sched = sched
            epoch = loop["epochs"]

        metrics_log = MetricsLogger(os.path.join(model_dir, "metrics.jsonl"))
        step_timer = StepTimer(warmup_steps=2)
        self._log("TRAINING START")
        while loop["worse_epochs"] < cfg.patience or epoch < cfg.min_n_epochs:
            if max_epochs is not None and epoch >= max_epochs:
                break
            epoch += 1
            loop["epochs"] += 1
            self.loaders["train"].set_epoch(epoch)
            lr = self.sched.lr
            self.state = set_learning_rate(self.state, lr)
            self._log(f"Epoch {epoch} lr={lr:.6g}")
            t0 = time.time()
            batch_losses = []
            for x, y in self.loaders["train"]:
                x, y = self._device_batch(x, y)
                with step_timer:
                    self.state, loss = self.train_step(self.state, x, y)
                batch_losses.append(loss)
                loop["step"] += 1
            train_loss = float(np.mean([float(l) for l in batch_losses]))
            val_loss = self.evaluate(self.loaders["val"])
            self.sched = self.sched.epoch_step()
            train_hist.append(train_loss)
            val_hist.append(val_loss)
            self._log(
                f"epoch {epoch}: train {train_loss:.4f} val {val_loss:.4f} "
                f"({time.time() - t0:.1f}s)"
            )
            metrics_log.log(
                loop["step"], epoch=epoch, train_loss=train_loss,
                val_loss=val_loss, lr=lr, **step_timer.summary(),
            )

            # early-stopping bookkeeping + 4-role checkpointing (train.py:588-616)
            if val_loss >= loop["best_loss"]:
                loop["worse_epochs"] += 1
            else:
                if new_best:
                    best_loss_checkpoint = loop["best_loss"]
                    best_epoch_checkpoint = loop["best_epoch"]
                    if os.path.exists(ckpt_best):
                        import shutil

                        shutil.copyfile(ckpt_best, ckpt_best_backup)
                self._log("MODEL IMPROVED ON VALIDATION SET!")
                loop["worse_epochs"] = 0
                loop["best_loss"] = val_loss
                loop["best_epoch"] = epoch
                new_best = True
                save_checkpoint(ckpt_best, self.state, loop, self.sched, self.np_rng)
            if val_loss < best_loss_checkpoint and (
                val_loss != loop["best_loss"] or best_loss_checkpoint == float("inf")
            ):
                best_loss_checkpoint = val_loss
                best_epoch_checkpoint = epoch
                save_checkpoint(ckpt_best_backup, self.state, loop, self.sched, self.np_rng)
            save_checkpoint(ckpt, self.state, loop, self.sched, self.np_rng)
            save_array_to_csv(f"{unique_name}_training_metrics.csv", [epoch, train_loss, val_loss])

            # periodic test (train.py:628-674)
            if epoch % cfg.test_step == 0:
                current = self.state
                if cfg.test_mode == "test_best":
                    src = ckpt_best if new_best else ckpt_best_backup
                    test_epoch = loop["best_epoch"] if new_best else best_epoch_checkpoint
                    if os.path.exists(src):
                        tstate, _, _ = load_checkpoint(src)
                        self.state = jax.tree_util.tree_map(jnp.asarray, tstate)
                else:
                    test_epoch = epoch
                test_best_results = self.evaluate_test(self.loaders["test"], epoch=test_epoch)
                save_array_to_csv(f"{unique_name}_test_metrics.csv", test_best_results)
                if test_best_results[10] <= best_test_metric:
                    self._log("Saving BEST TEST model...")
                    best_test_metric = test_best_results[10]
                    loop["best_test_epoch"] = test_epoch
                    save_checkpoint(ckpt_best_test, self.state, loop, self.sched, self.np_rng)
                if cfg.test_mode == "test_best":
                    self.state = current
                new_best = False

            if epoch % cfg.checkpoint_step == 0:
                archive_checkpoints(
                    model_dir, epoch,
                    {
                        "checkpoint_best": ckpt_best,
                        "checkpoint": ckpt,
                        "checkpoint_best_model_on_Test": ckpt_best_test,
                        "checkpoint_best_model_checkpoint": ckpt_best_backup,
                    },
                )

        # final: reload best-on-test and evaluate everything (train.py:692-716)
        self._log("TESTING")
        final_src = ckpt_best_test if os.path.exists(ckpt_best_test) else ckpt
        tstate, loop_final, _ = load_checkpoint(final_src)
        self.state = jax.tree_util.tree_map(jnp.asarray, tstate)
        results = {
            "train_loss": self.evaluate(self.loaders["train"]),
            "val_loss": self.evaluate(self.loaders["val"]),
            "test_loss": self.evaluate(self.loaders["test"]),
            "train_loss_hist": train_hist,
            "val_loss_hist": val_hist,
        }
        os.makedirs(cfg.results_path, exist_ok=True)
        with open(os.path.join(cfg.results_path, "results_dict.json"), "w") as f:
            json.dump(results, f, indent=2)
        final_test = self.evaluate_test(
            self.loaders["test"], epoch=loop_final.get("best_test_epoch", 0)
        )
        results["final_test"] = final_test
        return results

    # ---------------------------------------------------------------- helpers
    def run(self, max_epochs: Optional[int] = None) -> Dict:
        self.setup_data()
        self.setup_model()
        return self.fit(max_epochs=max_epochs)
