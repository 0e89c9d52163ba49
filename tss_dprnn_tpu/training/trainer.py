"""Base trainer (BSS) — reference src/trainers/trainer.py:16-306 rebuilt
around one jitted SPMD step.

Epoch orchestration reproduces the reference: best-loss tracking with
``best_loss`` start sentinel, best/last checkpoint naming, rolling retention,
early stop after ``early_stop`` non-improving epochs, per-``print_freq`` step
logs with the running ``-loss`` convention, eval-mixture audio demos via the
reporter. Departures (documented in SURVEY.md §5 as reference warts):
checkpoint-load failures hard-fail; the resume epoch defaults to the
checkpoint's saved epoch; the ``is_metrics`` in-training metric path actually
works (the reference's is broken, trainer.py:253-255).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Dict, Optional

import jax
import numpy as np

from tss_dprnn_tpu.ops import losses
from tss_dprnn_tpu.parallel import make_mesh, param_shardings, shard_batch
from tss_dprnn_tpu.training.schedulers import ExponentialDecay, ReduceLROnPlateau
from tss_dprnn_tpu.training.train_state import TrainState, create_train_state, make_optimizer
from tss_dprnn_tpu.utils.checkpoint import CheckpointManager, load_checkpoint_variables, to_pure_tree
from tss_dprnn_tpu.utils.logging_util import get_logger


def opt_path_key(path) -> str:
    """Stable tree-path key for one opt_state leaf, e.g.
    ``inner_state.2.mu.separation.core.blocks_0.intra_rnn.w_ih_f``.
    Used to serialize opt_state as {path: array} instead of a positional
    leaf list — a resumed run then restores each moment into the slot with
    the SAME MEANING, and an optimizer-config change that merely preserves
    leaf count while reordering/renaming leaves is a hard error instead of
    a silently-wrong restore."""
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:  # pragma: no cover - future jax key types
            parts.append(str(p))
    return ".".join(parts)


class Trainer:
    """BSS trainer: PIT SI-SDR loss over [B, 2, T] (reference trainer.py:39,104)."""

    mode = "bss"

    def __init__(self, model, config: Dict[str, Any], logger=None, reporter=None,
                 eval_mixtures: Optional[Dict] = None, mesh=None, seed: int = 0):
        self.model = model
        self.config = config
        self.logger = logger or get_logger("trainer")
        self.reporter = reporter
        self.eval_mixtures = eval_mixtures or {}
        self.mesh = mesh  # None -> sized to the first batch in _ensure_state
        self.seed = seed

        self.cur_epoch = int(config.get("cur_epoch", 0))
        self.print_freq = int(config.get("print_freq", 5))
        self.sample_rate = int(config.get("data", {}).get("sample_rate", 8000))
        self.is_metrics = bool(config.get("is_metrics", False))
        self.metrics = list(config.get("metrics") or ["si_sdr", "pesq", "stoi"])

        opt_cfg = config.get("optimizer", {})
        self.base_lr = float(opt_cfg.get("lr", 1e-3))
        self.weight_decay = float(opt_cfg.get("weight_decay", 0.0))
        self.clip_norm = float(config.get("clip_norm") or 0.0)
        # micro-batching: split each batch into accum_steps sequential
        # micro-batches, average grads, one optimizer update — trains batch
        # sizes whose activations exceed HBM (e.g. flagship fp32 on 16 GB)
        self.accum_steps = int(config.get("accum_steps", 1))
        # 'xla' | 'pallas' — forward-scan implementation; both differentiable
        # (ops/rnn._recurrence hand-written backward)
        self.lstm_backend = config.get("lstm_backend", "xla")
        # residual policy: 1 saves per-step (h, c); q > 1 saves every q-th
        # step and recomputes segments in the backward (fits flagship fp32
        # full-batch in 16 GB HBM; see ops/rnn.lstm_save_every)
        self.lstm_save_every = int(config.get("lstm_save_every", 1))
        # scheduling pragma: thread all-ones masks through the train/eval
        # graphs while the scans ignore them (rnn.lstm_ignore_lengths) —
        # value-equivalent on fixed-length crops up to float reduction order
        # (masked norms compute sum(x*m)/n vs mean(x): NOT bitwise, so
        # toggling it mid-run perturbs the trajectory at float level), and
        # the mask elementwise ops nudge XLA into a measurably better plan
        # (113.9 vs 118.4/118.8 ms flagship fast-path step, 2x measured
        # 2026-08-20, ROUND_NOTES session 10). Off by default: it is a
        # compiler-schedule lever, not semantics.
        self.schedule_masks = bool(config.get("schedule_masks", False))

        sched = config.get("lr_scheduler", {}) or {}
        decay_rate = sched.get("decay_rate")
        if decay_rate is not None:
            self.logger.info("lr_scheduler is ExponentialDecay.")
            self.lr_scheduler = ExponentialDecay(self.base_lr, float(decay_rate))
            self.plateau = False
        else:
            self.logger.info("lr_scheduler is ReduceLROnPlateau.")
            self.lr_scheduler = ReduceLROnPlateau(
                self.base_lr, float(sched.get("factor", 0.5)), int(sched.get("patience", 2))
            )
            self.plateau = True

        # exact-resume (capability superset over the reference, which saves an
        # 'optimizer' entry but never restores it, trainer.py:294-306): persist
        # opt_state + step + lr-scheduler + run counters and restore them all
        self.save_optimizer = bool(config.get("save_optimizer", False))
        self._resume_run: Optional[Dict[str, Any]] = None

        self.checkpoint_path = config.get("checkpoint_path")
        self.ckpt = CheckpointManager(
            config.get("new_checkpoints_path", "./chkpts"), int(config.get("n_checkpoints", 1000))
        )

        self.state: Optional[TrainState] = None
        self._train_step = None
        self._eval_step = None

    # ------------------------------------------------------------- model glue

    def _example_args(self, batch):
        return (batch["mix"][:1],), {}

    def _sched_lengths(self, batch):
        """All-ones-mask lengths vector for the schedule_masks pragma (None
        when disabled). Training batches are fixed-length crops, so
        lengths == T exactly and the masked graph's VALUES equal the
        unmasked one's."""
        if not self.schedule_masks:
            return None
        import jax.numpy as jnp

        mix = batch["mix"]
        return jnp.full((mix.shape[0],), mix.shape[1], jnp.int32)

    def _lengths_for(self, batch):
        """(model_lengths, loss_lengths): true per-row lengths when the batch
        carries them (variable-length training, VarLenTrainLoader), else the
        schedule_masks all-ones pragma for the model only (loss unmasked —
        fixed crops are full-length)."""
        true_lens = batch.get("lengths")
        if true_lens is not None:
            return true_lens, true_lens
        return self._sched_lengths(batch), None

    def _forward_loss(self, variables, batch, train: bool):
        """Returns (loss, batch_stats_updates, aux_dict). Overridden per mode."""
        sl, ll = self._lengths_for(batch)
        out = self.model.apply(variables, batch["mix"], **(
            {"lengths": sl} if sl is not None else {}))
        if self.is_metrics:
            loss, est = losses.pit_sisdr_loss(out, batch["sources"], return_est=True,
                                              lengths=ll)
            return loss, {}, {"est": est}
        loss = losses.pit_sisdr_loss(out, batch["sources"], lengths=ll)
        return loss, {}, {}

    # ---------------------------------------------------------------- lifecycle

    def _ensure_state(self, batch):
        if self.state is not None:
            return
        # variable-length batches carry true per-row lengths: the
        # schedule_masks pragma (scans IGNORE lengths) would silently break
        # masking there, so it is disabled for the whole run
        self._varlen = "lengths" in batch
        if self._varlen and self.schedule_masks:
            self.logger.info(
                "schedule_masks disabled: batches carry true lengths "
                "(variable-length training needs masked scans)")
        if self.mesh is None:
            # data axis must divide the batch: use the largest divisor of the
            # batch size that fits the device count
            import math

            B = int(np.asarray(batch["mix"]).shape[0])
            data = math.gcd(B, jax.device_count())
            self.mesh = make_mesh(data=data)
        self.logger.info("devices: %s (mesh %s)", jax.device_count(), dict(self.mesh.shape))
        tx = make_optimizer(self.base_lr, self.weight_decay, self.clip_norm or None)
        args, kwargs = self._example_args(batch)
        state = create_train_state(self.model, jax.random.PRNGKey(self.seed), args, tx, kwargs)
        if self.checkpoint_path:
            self.logger.info("Continue training from checkpoint: %s.", self.checkpoint_path)
            loaded = load_checkpoint_variables(self.checkpoint_path, state.variables)
            state = state.replace(
                params=loaded["variables"]["params"],
                batch_stats=loaded["variables"].get("batch_stats", state.batch_stats),
            )
            if "cur_epoch" not in self.config or self.config.get("cur_epoch") in (None, 0):
                self.cur_epoch = loaded["epoch"]
            extras = loaded.get("extras") or {}
            has_opt = extras.get("opt_named") is not None or extras.get("opt_leaves") is not None
            if self.save_optimizer and has_opt:
                import jax.numpy as jnp

                flat, treedef = jax.tree_util.tree_flatten_with_path(state.opt_state)
                named = extras.get("opt_named")
                if named is not None:
                    # name-keyed restore: every template leaf fetched by its
                    # tree path; missing/extra keys are a hard, explicit error
                    expect = [opt_path_key(p) for p, _ in flat]
                    missing = [k for k in expect if k not in named]
                    extra = sorted(set(named) - set(expect))
                    if missing or extra:
                        raise ValueError(
                            "checkpoint opt_state does not match the optimizer "
                            f"config — missing keys: {missing[:5]}{'...' if len(missing) > 5 else ''}, "
                            f"unexpected keys: {extra[:5]}{'...' if len(extra) > 5 else ''}"
                        )
                    saved_seq = [named[k] for k in expect]
                else:
                    # legacy positional leaf list (pre round-3 checkpoints):
                    # count check BEFORE the zip: zip would silently truncate
                    # a checkpoint with MORE leaves into positionally-wrong
                    # slots
                    assert len(extras["opt_leaves"]) == len(flat), (
                        f"checkpoint opt_state has {len(extras['opt_leaves'])} leaves, "
                        f"optimizer expects {len(flat)} — config mismatch"
                    )
                    saved_seq = extras["opt_leaves"]
                leaves = [
                    jnp.asarray(np.asarray(saved), t.dtype)
                    for saved, (_, t) in zip(saved_seq, flat)
                ]
                state = state.replace(
                    opt_state=jax.tree_util.tree_unflatten(treedef, leaves),
                    step=jnp.asarray(int(extras.get("step", 0)), jnp.int32),
                )
                if extras.get("scheduler"):
                    self.lr_scheduler.load_state_dict(extras["scheduler"])
                    # push the restored lr into the state: the fresh opt_state
                    # was built with base_lr, but the resumed epoch must train
                    # at the scheduler's current lr
                    state = state.set_learning_rate(self.lr_scheduler.lr)
                self._resume_run = extras.get("run")
                self.logger.info("Exact resume: optimizer/scheduler state restored.")
        else:
            self.logger.info("Starting new training run.")
        # Commit the WHOLE state to the mesh (params, batch_stats, opt_state,
        # step, lr): replicated under DP, TP rules when model axis > 1 — the
        # path regexes also match the optax mu/nu mirrors of sharded params.
        # Leaving any leaf uncommitted makes the jitted step's second call a
        # full retrace+recompile (input avals gain the mesh annotation only
        # after the first donated update) — ~33 s wasted on the flagship.
        shardings = param_shardings(state, self.mesh)
        self.state = jax.device_put(state, shardings)
        self._build_steps()

    def _build_steps(self):
        from tss_dprnn_tpu.ops import rnn as rnn_ops

        accum = self.accum_steps
        backend = self.lstm_backend
        save_every = self.lstm_save_every

        sched = self.schedule_masks and not getattr(self, "_varlen", False)

        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch):
            with rnn_ops.lstm_backend(backend), rnn_ops.lstm_save_every(save_every), \
                    rnn_ops.lstm_ignore_lengths(sched):
                return _train_step_body(state, batch)

        def _train_step_body(state: TrainState, batch):
            def loss_fn(params, micro):
                variables = {"params": params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                loss, new_bs, aux = self._forward_loss(variables, micro, train=True)
                return loss, (new_bs, aux)

            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            if accum <= 1:
                (loss, (new_bs, aux)), grads = grad_fn(state.params, batch)
            else:
                micros = jax.tree.map(
                    lambda a: a.reshape((accum, a.shape[0] // accum) + a.shape[1:]), batch
                )

                import jax.numpy as jnp

                def body(carry, micro):
                    g_acc, l_acc = carry
                    (l, (bs, aux)), g = grad_fn(state.params, micro)
                    return (jax.tree.map(lambda a, g_: a + g_, g_acc, g), l_acc + l), (bs, aux)

                zero_g = jax.tree.map(jnp.zeros_like, state.params)
                (g_sum, l_sum), (bs_seq, aux_seq) = jax.lax.scan(
                    body, (zero_g, 0.0), micros
                )
                grads = jax.tree.map(lambda g: g / accum, g_sum)
                loss = l_sum / accum
                new_bs = jax.tree.map(lambda a: a[-1], bs_seq)  # last micro's stats
                aux = jax.tree.map(lambda a: a[-1], aux_seq)
            state = state.apply_gradients(grads)
            if new_bs:
                state = state.replace(batch_stats=new_bs)
            return state, loss, aux

        @jax.jit
        def eval_step(state: TrainState, batch):
            with rnn_ops.lstm_backend(backend), rnn_ops.lstm_ignore_lengths(sched):
                variables = {"params": state.params}
                if state.batch_stats:
                    variables["batch_stats"] = state.batch_stats
                loss, _, aux = self._forward_loss(variables, batch, train=False)
                return loss, aux

        self._train_step = train_step
        self._eval_step = eval_step

    # ------------------------------------------------------------------ epochs

    def train(self, dataloader) -> float:
        from tss_dprnn_tpu.utils.profiling import trace

        self.logger.info("Set train mode...")
        if hasattr(dataloader, "set_epoch"):
            # epoch-keyed shuffle: a resumed run replays the same batch order
            # the uninterrupted run would have seen (exact-resume contract)
            dataloader.set_epoch(self.cur_epoch)
        num_steps = len(dataloader)
        total_loss = 0.0
        self._metric_sums = {}
        self._metric_cnt = 0
        start_time = time.time()
        profile_dir = self.config.get("profile_dir") if self.cur_epoch == 1 else None
        # loss accumulates ON DEVICE; the host syncs only at print_freq
        # boundaries — a per-step float(loss) would serialize host-side data
        # prep/dispatch against every device step
        loss_sum = None
        with trace(profile_dir):
            for step, batch in enumerate(dataloader):
                self._ensure_state(batch)
                sharded = shard_batch(batch, self.mesh)
                self.state, loss, aux = self._train_step(self.state, sharded)
                loss_sum = loss if loss_sum is None else loss_sum + loss
                if self.is_metrics:
                    self._accumulate_metrics(batch, aux)
                if step % self.print_freq == 0:
                    total_loss = float(loss_sum)
                    self._log_step(step, total_loss, aux)
        total_loss = float(loss_sum) if loss_sum is not None else 0.0
        end_time = time.time()
        return self._log_epoch(total_loss, max(num_steps, 1), start_time, end_time, "train")

    def eval(self, dataloader) -> float:
        self.logger.info("Set eval mode...")
        num_steps = len(dataloader)
        total_loss = 0.0
        start_time = time.time()
        loss_sum = None
        for step, batch in enumerate(dataloader):
            self._ensure_state(batch)
            sharded = shard_batch(batch, self.mesh)
            loss, _ = self._eval_step(self.state, sharded)
            loss_sum = loss if loss_sum is None else loss_sum + loss
            if step % self.print_freq == 0:
                total_loss = float(loss_sum)
                self._log_step(step, total_loss, {})
        total_loss = float(loss_sum) if loss_sum is not None else 0.0
        end_time = time.time()
        return self._log_epoch(total_loss, max(num_steps, 1), start_time, end_time, "eval")

    def run(self, train_loader, eval_loader, n_epochs: int, early_stop: int):
        if self.state is None:
            # materialize (and, when checkpoint_path is set, restore) state
            # BEFORE the epoch loop: the resume epoch and exact-resume run
            # counters must be in place when the loop starts, not at the
            # first batch of an already-begun epoch
            batch = train_loader.peek() if hasattr(train_loader, "peek") \
                else next(iter(train_loader))
            self._ensure_state(batch)
        best_loss = 100500.0  # reference sentinel (trainer.py:181)
        no_improve_cnt = 0
        if self._resume_run is not None:
            best_loss = float(self._resume_run.get("best_loss", best_loss))
            no_improve_cnt = int(self._resume_run.get("no_improve_cnt", no_improve_cnt))
            self._resume_run = None
        self._run_counters = {"best_loss": best_loss, "no_improve_cnt": no_improve_cnt}
        while self.cur_epoch < n_epochs:
            self.logger.info("Initiating epoch %d.", self.cur_epoch)
            self.cur_epoch += 1
            self.train(train_loader)
            eval_loss = self.eval(eval_loader)

            lr = self.lr_scheduler.step(eval_loss) if self.plateau else self.lr_scheduler.step()
            self.state = self.state.set_learning_rate(lr)

            if eval_loss >= best_loss:
                no_improve_cnt += 1
                self._run_counters = {"best_loss": best_loss, "no_improve_cnt": no_improve_cnt}
                self.logger.info("No improvement, Best Loss: %.4f.", -best_loss)
            else:
                best_loss = eval_loss
                no_improve_cnt = 0
                self._run_counters = {"best_loss": best_loss, "no_improve_cnt": no_improve_cnt}
                self._save_checkpoint(best=True)
                self.logger.info(
                    "Epoch: %d, Now Best Loss Change: %.4f.", self.cur_epoch, -best_loss
                )
                self._mixtures_inference()
            if no_improve_cnt == early_stop:
                self.logger.info("Stop training cause no impr for %d epochs", no_improve_cnt)
                break
        self._save_checkpoint(best=False)
        self.logger.info("Training for %d/%d epoches done!", self.cur_epoch, n_epochs)

    # ------------------------------------------------------------------- logs

    def _accumulate_metrics(self, batch, aux):
        """Working replacement for the reference's broken is_metrics path
        (trainer.py:253-255 UnboundLocalError): accumulates per-utterance
        host metrics over the epoch."""
        from tss_dprnn_tpu.ops import metrics as metrics_mod

        est = aux.get("est")
        if est is None:
            return
        est = np.asarray(est)
        target = np.asarray(batch.get("target", batch.get("sources")))
        mix = np.asarray(batch["mix"])
        for b in range(mix.shape[0]):
            md = metrics_mod.get_metrics(mix[b], target[b], est[b], self.sample_rate,
                                         self.metrics)
            for k in self.metrics:
                if md.get(k) is not None and np.isfinite(md[k]):
                    self._metric_sums[k] = self._metric_sums.get(k, 0.0) + md[k]
            self._metric_cnt += 1

    def _log_step(self, step, total_loss, aux):
        self.logger.info(
            "<epoch:%d, iter:%d, lr:%.3e, loss:%.3f>.",
            self.cur_epoch,
            step,
            self.state.learning_rate if self.state else self.base_lr,
            -total_loss / (step + 1),
        )

    def _log_epoch(self, total_loss, num_steps, start_time, end_time, mode_name):
        total_loss = total_loss / num_steps
        metric_dict = None
        if self.is_metrics and getattr(self, "_metric_cnt", 0) > 0:
            metric_dict = {k: v / self._metric_cnt for k, v in self._metric_sums.items()}
        if self.reporter is not None:
            self.reporter.add_and_report(
                logs={"step": self.cur_epoch, "loss": -total_loss, "metrics": metric_dict},
                mode=mode_name,
            )
        self.logger.info(
            "Finished *** <epoch:%d, iter:%d, loss:%.3f, Total time:%.3f min>.",
            self.cur_epoch, num_steps, -total_loss, (end_time - start_time) / 60,
        )
        return total_loss

    # ------------------------------------------------------------- inference

    def _mixtures_inference(self):
        if not self.eval_mixtures or self.state is None:
            return
        mixtures = self.eval_mixtures
        for mid, item in mixtures.items():
            mix = np.asarray(item["mix"], np.float32)[None]
            out = self.model.apply(self.state.variables, mix)
            sources = np.stack([item["s1_target"], item["s2_target"]])[None]
            _, est = losses.pit_sisdr_loss(out, sources, return_est=True)
            est = np.asarray(est)[0]
            item["s1_estimated"] = est[0]
            item["s2_estimated"] = est[1]
        if self.reporter is not None:
            self.reporter.add_and_report(
                logs={"step": self.cur_epoch, "mixtures": mixtures}, mode="inference"
            )

    # ----------------------------------------------------------- checkpoints

    def _save_checkpoint(self, best: bool = False):
        # like the reference we persist the model (+epoch); its 'optimizer'
        # entry is never consumed on warm start (trainer.py:70-77 loads only
        # 'model'), so optimizer moments are not serialized here
        tree = {
            "epoch": self.cur_epoch,
            "params": to_pure_tree(self.state.params),
            "batch_stats": to_pure_tree(self.state.batch_stats),
        }
        if self.save_optimizer:
            # exact-resume payload: opt_state keyed by TREE PATH (restored by
            # name with a hard error on missing/extra keys — positional slots
            # can restore silently-wrong moments across optax config changes
            # that preserve leaf count), global step, lr-scheduler internals,
            # and the run loop's best/no-improve counters —
            # train(2 epochs) == train(1) + resume(1), bitwise
            tree["opt_named"] = {
                opt_path_key(p): np.asarray(a)
                for p, a in jax.tree_util.tree_flatten_with_path(self.state.opt_state)[0]
            }
            tree["step"] = int(self.state.step)
            tree["scheduler"] = self.lr_scheduler.state_dict()
            run_counters = dict(getattr(self, "_run_counters", {}) or {})
            if run_counters:
                tree["run"] = run_counters
        path = self.ckpt.save(self.cur_epoch, tree, best=best)
        self.logger.info("Saved checkpoint: %s", path)
