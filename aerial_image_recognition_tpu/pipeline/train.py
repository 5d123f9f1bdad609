"""First-party training path (the reference trained offline in Colab via
ultralytics — x_arch/01_train_tokyo.ipynb; this replaces that workflow with
an in-framework, mesh-sharded JAX trainer).

Data-parallel by construction: params/opt-state replicated, image/target
batches sharded on dim 0 over the ``data`` mesh axis; gradients are averaged
by XLA's automatic psum when the jitted step runs under a Mesh with sharded
inputs (no hand-written collectives needed — the scaling-book recipe).
"""

import functools

from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aerial_image_recognition_tpu.models.registry import ModelBundle
from aerial_image_recognition_tpu.ops.losses import (
    xunet_loss, yolov7_loss, yolov8_loss,
)
from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch


@dataclass
class TrainState:
    params: Any          # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: int = 0


def resolve_freeze_prefixes(bundle: ModelBundle, freeze) -> tuple:
    """Normalize a `freeze` spec into flax param-path prefixes.

    Accepts the ultralytics addressing the reference trained with
    (notebook cell 14: freeze=[0,1,2] — upstream yaml layer indices,
    resolved through the same vendored index tables the weight bridge
    uses) and/or explicit module-path prefixes ('stem0', 'elan1/cv1').
    Indices absent from the table address parameterless layers (maxpool/
    upsample/concat) and are no-ops, exactly as in ultralytics.
    """
    if not freeze:
        return ()
    prefixes = []
    index_table = None
    for item in freeze:
        if isinstance(item, str) and not item.isdigit():
            prefixes.append(item)
            continue
        if index_table is None:
            from aerial_image_recognition_tpu.models.import_torch import (
                layer_index_prefixes)
            index_table = layer_index_prefixes(bundle.spec.name)
        prefixes.extend(index_table.get(int(item), []))
    return tuple(prefixes)


def _path_str(path) -> str:
    parts = []
    for k in path:
        parts.append(str(getattr(k, "key", getattr(k, "idx", k))))
    return "/".join(parts)


def _freeze_mask(params, prefixes) -> Any:
    """Pytree of bools matching `params`: True = trainable. A leaf is
    frozen when its path starts with any prefix. Consumed by
    make_optimizer via optax.multi_transform + set_to_zero — frozen
    leaves get a literal zero update (NOT optax.masked, whose masked-out
    leaves pass raw gradients through as updates), so neither gradients
    nor adamw weight decay ever touch them."""
    pref = [p.split("/") for p in prefixes]
    hits = [0] * len(pref)

    def trainable(path, _leaf):
        parts = _path_str(path).split("/")
        frozen = False
        for i, p in enumerate(pref):
            if parts[:len(p)] == p:
                hits[i] += 1
                frozen = True
        return not frozen

    mask = jax.tree_util.tree_map_with_path(trainable, params)
    missing = [prefixes[i] for i, h in enumerate(hits) if h == 0]
    if missing:
        # a typo'd prefix must not silently train the layer the user
        # believes is frozen
        raise ValueError(
            f"freeze prefixes matched no parameters: {missing} — check "
            "them against the model's module paths (e.g. 'stem0', "
            "'elan1/cv1')")
    return mask


def _restore_frozen_stats(old_stats, new_stats, prefixes):
    """batch-mode BN in frozen layers must not update its running
    statistics either (ultralytics puts frozen modules in eval mode)."""
    pref = tuple(p.split("/") for p in prefixes)

    def pick(path, new, old):
        parts = _path_str(path).split("/")
        frozen = any(parts[:len(p)] == list(p) for p in pref)
        return old if frozen else new

    return jax.tree_util.tree_map_with_path(pick, new_stats, old_stats)


def make_optimizer(lr: float = 1e-4, weight_decay: float = 5e-4,
                   total_steps: Optional[int] = None,
                   warmup_steps: int = 0, schedule: str = "constant",
                   final_lr_frac: float = 0.01,
                   param_mask: Any = None):
    """lr0=1e-4 matches the notebook's training config (01_train_tokyo
    cell 14). schedule: 'constant' (round-1 behavior), 'cosine' or 'linear'
    — the ultralytics recipe the reference trained with is a 3-epoch warmup
    into a decay toward lr·lrf (lrf=0.01 default); both decays need
    total_steps."""
    if schedule == "constant" and warmup_steps:
        lr = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
             optax.constant_schedule(lr)], [warmup_steps])
    elif schedule != "constant":
        if not total_steps:
            raise ValueError(f"schedule={schedule!r} requires total_steps")
        end = lr * final_lr_frac
        if schedule == "cosine":
            sched = optax.warmup_cosine_decay_schedule(
                init_value=0.0 if warmup_steps else lr, peak_value=lr,
                warmup_steps=warmup_steps,
                decay_steps=total_steps, end_value=end)
        elif schedule == "linear":
            sched = optax.join_schedules(
                [optax.linear_schedule(0.0 if warmup_steps else lr, lr,
                                       max(warmup_steps, 1)),
                 optax.linear_schedule(
                     lr, end, max(total_steps - warmup_steps, 1))],
                [warmup_steps])
        else:
            raise ValueError(f"unknown schedule {schedule!r}")
        lr = sched
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )
    if param_mask is not None:
        labels = jax.tree_util.tree_map(
            lambda trainable: "train" if trainable else "freeze", param_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx


def resolve_bn_mode(bundle: ModelBundle, bn_mode: str) -> str:
    """'auto' → the per-family validated default.

    yolov7: 'frozen' — on the 512-image fake-world A/B (VERDICT round-1
    item 6) frozen reached eval mAP50 1.00 vs batch 0.70.
    yolov8 (and other deep-residual nets): 'batch' — frozen-at-init means
    the trunk trains with NO effective normalization (running stats are
    the identity), and the v8 C2f residual stacks diverge within tens of
    steps at any tested lr (cls logits → −1e11; instrumented fake-world
    run, round 2). Batch mode is stable; its eval-time running-average lag
    is fixed by `recalibrate_bn` (fit() applies it before every eval).
    """
    if bn_mode != "auto":
        return bn_mode
    # only yolov8 is KNOWN to require batch; yolov7 and xunet (no residual
    # trunk) keep the small-data-validated frozen default
    return "batch" if bundle.spec.family == "yolov8" else "frozen"


def make_train_step(bundle: ModelBundle, tx,
                    mesh: Optional[Mesh] = None,
                    axis_name: str = "data",
                    loss_kwargs: Optional[Dict] = None,
                    bn_mode: str = "auto",
                    remat: bool = False,
                    ema_decay: float = 0.0,
                    freeze=None) -> Callable:
    """Returns jitted (state, images_u8 [B,S,S,3], targets [B,T,5]) → (state, metrics).

    Under a mesh, images/targets arrive sharded on dim 0 and XLA inserts the
    gradient all-reduce over ICI automatically.

    bn_mode: 'frozen' = BN applies its running statistics as a fixed
    affine during training too — train/eval consistent by construction;
    'batch' = standard BatchNorm training (batch statistics +
    running-average updates); 'auto' (default) = per-family validated
    choice, see `resolve_bn_mode`.
    """
    module = bundle.module
    spec = bundle.spec
    bn_mode = resolve_bn_mode(bundle, bn_mode)
    freeze_prefixes = resolve_freeze_prefixes(bundle, freeze)

    def _forward_frozen(params, batch_stats, x):
        return module.apply({"params": params, "batch_stats": batch_stats},
                            x, train=False)

    def _forward_batch(params, batch_stats, x):
        # functionally pure: the mutated batch_stats are a returned value
        return module.apply({"params": params, "batch_stats": batch_stats},
                            x, train=True, mutable=["batch_stats"])

    if remat:
        # rematerialize the backbone on the backward pass: trades ~1 extra
        # forward of FLOPs for dropping all intermediate conv activations
        # from HBM — the lever for big device batches at 640 px (task-spec
        # HBM guidance)
        _forward_frozen = jax.checkpoint(_forward_frozen)
        _forward_batch = jax.checkpoint(_forward_batch)

    def loss_fn(params, batch_stats, images_u8, targets):
        x = preprocess_batch(images_u8, out_size=images_u8.shape[1],
                             dtype=jnp.bfloat16)
        if bn_mode == "frozen":
            outs = _forward_frozen(params, batch_stats, x)
            updates = {"batch_stats": batch_stats}
        else:
            outs, updates = _forward_batch(params, batch_stats, x)
        lk = loss_kwargs or {}
        if spec.family == "yolov7":
            loss, metrics = yolov7_loss(outs, targets, module.anchors,
                                        spec.num_classes, **lk)
        elif spec.family == "yolov8":
            loss, metrics = yolov8_loss(outs, targets, spec.num_classes, **lk)
        elif spec.family == "xunet":
            loss, metrics = xunet_loss(outs, targets)
        else:
            raise NotImplementedError(spec.family)
        return loss, (metrics, updates["batch_stats"])

    def step(state: Dict, images_u8, targets):
        params = state["params"]
        batch_stats = state["batch_stats"]
        (loss, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, images_u8, targets)
        if freeze_prefixes and bn_mode != "frozen":
            new_bs = _restore_frozen_stats(batch_stats, new_bs,
                                           freeze_prefixes)
        updates, new_opt = tx.update(grads, state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        new_step = state["step"] + 1
        out = {"params": new_params, "batch_stats": new_bs,
               "opt_state": new_opt, "step": new_step}
        if ema_decay > 0.0:
            # the ultralytics EMA ramp (the recipe the reference's models
            # were produced with): effective decay grows d·(1−e^(−t/2000)),
            # so early steps track the raw weights and late steps smooth
            d = ema_decay * (1.0 - jnp.exp(-new_step / 2000.0))
            out["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state["ema_params"], new_params)
        return out, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(axis_name))
        return jax.jit(step,
                       in_shardings=(repl, data, data),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


def init_train_state(bundle: ModelBundle, tx,
                     ema_decay: float = 0.0) -> Dict:
    variables = bundle.params
    # copy: the jitted train step donates its state argument, and aliasing
    # bundle.params here would delete the bundle's own buffers on step 1
    params = jax.tree_util.tree_map(jnp.array, variables["params"])
    batch_stats = jax.tree_util.tree_map(
        jnp.array, variables.get("batch_stats", {}))
    state = {"params": params, "batch_stats": batch_stats,
             "opt_state": tx.init(params), "step": 0}
    if ema_decay > 0.0:
        state["ema_params"] = jax.tree_util.tree_map(
            lambda p: jnp.array(p, jnp.float32), params)
    return state


def recalibrate_bn(bundle: ModelBundle, state: Dict, loader,
                   passes: int = 4, freeze_prefixes=()) -> Dict:
    """Recompute BatchNorm running statistics from the FINAL weights.

    Standard post-training BN recalibration: run train-mode forwards
    (statistics updating, parameters untouched) over the loader `passes`
    times so the running averages converge to the statistics of the
    trained network — the batch-mode eval lag observed in the round-1 A/B
    (eval mAP oscillating while train loss falls) is exactly stale running
    averages, and this removes it. Returns the state with updated
    'batch_stats'. No-op for models without batch_stats.

    freeze_prefixes: frozen layers keep their original statistics (a
    frozen pretrained layer's BN must describe the distribution it was
    trained on, not this loader's — ultralytics keeps frozen modules in
    eval mode throughout).
    """
    if not state.get("batch_stats"):
        return state
    params = state.get("ema_params", state["params"])
    # params passed as an argument (not closed over): a closure would bake
    # the weight tree into the HLO as constants and recompile every call
    stats_step = _recalibrate_step(bundle.module)

    bs = state["batch_stats"]
    for p in range(passes):
        for images, _targets in loader.epoch(10_000 + p):
            bs = stats_step(params, bs, images)
    if freeze_prefixes:
        bs = _restore_frozen_stats(state["batch_stats"], bs,
                                   freeze_prefixes)
    return dict(state, batch_stats=bs)


@functools.lru_cache(maxsize=8)
def _recalibrate_step(module):
    # keyed on the (hashable, frozen) flax module so repeated
    # recalibrations reuse one traced/compiled step
    @jax.jit
    def stats_step(params, batch_stats, images_u8):
        x = preprocess_batch(images_u8, out_size=images_u8.shape[1],
                             dtype=jnp.bfloat16)
        _, updates = module.apply(
            {"params": params, "batch_stats": batch_stats}, x, train=True,
            mutable=["batch_stats"])
        return updates["batch_stats"]
    return stats_step


def fit(bundle: ModelBundle, loader, *, epochs: int = 1,
        lr: float = 1e-4, mesh: Optional[Mesh] = None,
        eval_loader=None, eval_every: int = 1, eval_fn=None,
        conf_threshold: float = 0.25, log_fn=print,
        bn_mode: str = "auto", remat: bool = False,
        ckpt_dir: Optional[str] = None, ckpt_every: int = 1,
        loss_kwargs: Optional[Dict] = None,
        lr_schedule: str = "constant", warmup_epochs: float = 0.0,
        final_lr_frac: float = 0.01, ema_decay: float = 0.0,
        freeze=None, patience: Optional[int] = None) -> Dict:
    """Train a detector: notebook-workflow parity
    (01_train_tokyo.ipynb cell 14: epochs/lr0/augment recipe live in the
    loader config) with in-framework mAP validation (cell 22).

    ckpt_dir: orbax train-state checkpointing — saves every ckpt_every
    epochs and RESUMES from the latest epoch found there, so multi-session
    training continues exactly (runtime/train_ckpt.py).

    lr_schedule/'warmup_epochs'/'final_lr_frac': 'cosine' or 'linear' decay
    toward lr·final_lr_frac with a warmup ramp — the ultralytics recipe the
    reference's checkpoints were trained under (warmup 3 epochs, lrf 0.01).
    ema_decay (e.g. 0.9999): maintain an exponential moving average of the
    weights with the ultralytics ramp; evaluation and the returned state
    prefer 'ema_params' when present. Both default OFF to preserve the
    validated round-1 recipe.

    freeze: list of upstream yaml layer indices and/or flax module-path
    prefixes to exclude from training entirely (no optimizer update, no
    weight decay, no BN-statistic drift) — the notebook fine-tunes with
    freeze=[0,1,2] (cell 14). See `resolve_freeze_prefixes`.

    patience: early stopping (notebook cell 14: patience=40) — stop when
    `patience` epochs pass without the fitness metric improving. Fitness
    is the ultralytics composite 0.1·mAP50 + 0.9·mAP50-95, computed at
    every eval (so eval_every must divide into the patience window for
    counting to be meaningful). Whenever eval runs, the best weights so
    far are retained host-side and returned under state['best']
    ({'params','batch_stats','epoch','fitness'} — the analogue of
    ultralytics best.pt, EMA weights when EMA is on); tracking happens
    with or without patience.

    eval_fn: custom metric callback `(bundle, state) -> {name: float}`
    replacing the built-in detection mAP eval — e.g. mask IoU for
    segmentation heads. Include a 'fitness' key to drive best-weight
    retention and patience; without one, metrics are logged only.

    Returns the final state dict ({'params','batch_stats',...}); pass
    {'params': ..., 'batch_stats': ...} to inference functions or
    models.registry.save_params to persist.
    """
    import os

    import numpy as np

    if getattr(getattr(loader, "cfg", None), "close_mosaic", 0):
        # the loader needs the horizon to know when the close_mosaic
        # window starts (ultralytics: last N epochs run without the
        # composite augmentations)
        loader.total_epochs = epochs
    param_mask = None
    freeze_prefixes = resolve_freeze_prefixes(bundle, freeze)
    if freeze_prefixes:
        param_mask = _freeze_mask(bundle.params["params"], freeze_prefixes)
    if lr_schedule == "constant" and not warmup_epochs:
        tx = make_optimizer(lr=lr, param_mask=param_mask)
    else:
        # duck-typed loaders can expose steps_per_epoch directly; the
        # standard DetectionLoader derives it from samples/batch
        steps_per_epoch = getattr(loader, "steps_per_epoch", None)
        if steps_per_epoch is None:
            try:
                steps_per_epoch = max(
                    1, len(loader.samples) // max(loader.cfg.batch_size, 1))
            except AttributeError:
                raise ValueError(
                    "lr schedules need the steps-per-epoch: expose a "
                    "steps_per_epoch attribute on custom loaders") from None
        tx = make_optimizer(
            lr=lr, schedule=lr_schedule,
            total_steps=steps_per_epoch * epochs,
            warmup_steps=int(round(warmup_epochs * steps_per_epoch)),
            final_lr_frac=final_lr_frac, param_mask=param_mask)
    bn_mode = resolve_bn_mode(bundle, bn_mode)
    # pass the RESOLVED prefixes (resolution is idempotent — plain module
    # prefixes pass through) so the optimizer mask and the BN-stat
    # restore set cannot desynchronize
    step_fn = make_train_step(bundle, tx, mesh=mesh, bn_mode=bn_mode,
                              remat=remat, loss_kwargs=loss_kwargs,
                              ema_decay=ema_decay, freeze=freeze_prefixes)
    state = init_train_state(bundle, tx, ema_decay=ema_decay)
    start_epoch = 0
    if ckpt_dir:
        from aerial_image_recognition_tpu.runtime.train_ckpt import (
            load_train_state)
        import re as _re
        done = sorted(int(d.split("_")[-1])
                      for d in os.listdir(ckpt_dir)
                      if _re.fullmatch(r"epoch_\d+", d)) if os.path.isdir(
                          ckpt_dir) else []
        if done:
            start_epoch = done[-1] + 1
            path = os.path.join(ckpt_dir, f"epoch_{done[-1]}")
            try:
                state = load_train_state(path, state)
            except Exception:
                if "ema_params" not in state:
                    raise
                # checkpoint predates EMA tracking: restore without it and
                # re-seed the average from the restored weights
                tmpl = {k: v for k, v in state.items() if k != "ema_params"}
                state = load_train_state(path, tmpl)
                state["ema_params"] = jax.tree_util.tree_map(
                    lambda p: jnp.array(p, jnp.float32), state["params"])
            log_fn(f"resumed from epoch {done[-1]} "
                   f"(step {state['step']})")
    if mesh is not None:
        state = jax.device_put(state, NamedSharding(mesh, P()))
    history = []
    best = None
    best_epoch = start_epoch - 1
    for epoch in range(start_epoch, epochs):
        losses = []
        stop_early = False
        for images, targets in loader.epoch(epoch):
            if mesh is not None:
                sh = NamedSharding(mesh, P("data"))
                images = jax.device_put(images, sh)
                targets = jax.device_put(targets, sh)
            state, metrics = step_fn(state, images, targets)
            losses.append(float(metrics["loss"]))
        row = {"epoch": epoch, "loss": float(jnp.mean(jnp.asarray(losses)))
               if losses else float("nan")}
        if ((eval_loader is not None or eval_fn is not None)
                and (epoch + 1) % eval_every == 0):
            if bn_mode == "batch":
                # running averages lag the trained network (round-1 A/B:
                # eval oscillates while train loss falls) — recalibrate
                # the BN statistics from the current weights before eval
                state = recalibrate_bn(bundle, state, loader, passes=1,
                                       freeze_prefixes=freeze_prefixes)
            if eval_fn is not None:
                row.update(eval_fn(bundle, state))
            else:
                row.update(evaluate(bundle, state, eval_loader,
                                    conf_threshold=conf_threshold))
            # ultralytics fitness: 0.1·mAP50 + 0.9·mAP50-95. Ties go to
            # the LATER epoch (more trained): on a flat curve — e.g. mAP
            # pinned at 0 early in a from-scratch run — 'best' must not
            # freeze the first eval's near-untrained weights
            if "fitness" not in row and "mAP50" in row:
                row["fitness"] = (0.1 * row["mAP50"]
                                  + 0.9 * row["mAP50_95"])
            if "fitness" not in row:
                pass                       # metrics logged only
            elif best is None or row["fitness"] >= best["fitness"]:
                if best is None or row["fitness"] > best["fitness"]:
                    best_epoch = epoch     # patience counts improvements
                best = {"params": jax.device_get(
                            state.get("ema_params", state["params"])),
                        "batch_stats": jax.device_get(state["batch_stats"]),
                        "epoch": epoch, "fitness": row["fitness"]}
            # early stop is decided only when an eval just ran: with
            # eval_every>1 an epoch-granular check could fire between
            # evals, never giving the model another eval to improve at.
            # (best is None when no eval has produced a fitness yet —
            # fitness-less eval_fns never early-stop)
            stop_early = (patience is not None and patience > 0
                          and best is not None
                          and epoch - best_epoch >= patience)
        history.append(row)
        log_fn(f"epoch {epoch}: " + ", ".join(
            f"{k}={v:.4f}" for k, v in row.items() if k != "epoch"))
        if ckpt_dir and (epoch + 1) % ckpt_every == 0:
            from aerial_image_recognition_tpu.runtime.train_ckpt import (
                save_train_state)
            save_train_state(state, os.path.join(ckpt_dir,
                                                 f"epoch_{epoch}"))
        if stop_early:
            log_fn(f"early stop at epoch {epoch}: fitness "
                   f"{best['fitness']:.4f} has not improved since epoch "
                   f"{best_epoch} (patience {patience})")
            break
    if bn_mode == "batch" and epochs > start_epoch:
        state = recalibrate_bn(bundle, state, loader, passes=2,
                               freeze_prefixes=freeze_prefixes)
    if best is not None:
        state["best"] = best
    state["history"] = history
    return state


def evaluate(bundle: ModelBundle, state: Dict, loader,
             conf_threshold: float = 0.25) -> Dict[str, float]:
    """mAP over a validation loader (notebook cell 22 parity)."""
    import numpy as np
    from aerial_image_recognition_tpu.ops.metrics import evaluate_detections
    from aerial_image_recognition_tpu.ops.nms import batched_nms

    # EMA weights, when tracked, are the deployment weights (ultralytics
    # validates the EMA model too)
    variables = {"params": state.get("ema_params", state["params"]),
                 "batch_stats": state["batch_stats"]}
    nc = bundle.spec.num_classes

    @jax.jit
    def infer(images_u8):
        x = preprocess_batch(images_u8, out_size=images_u8.shape[1],
                             dtype=jnp.bfloat16)
        boxes, scores = bundle.forward(variables, x)
        return batched_nms(boxes, scores, num_classes=nc,
                           conf_threshold=conf_threshold, max_det=128)

    preds, gts = [], []
    for images, targets in loader.epoch(0):
        det = infer(images)
        for bi in range(images.shape[0]):
            v = np.asarray(det.valid[bi])
            preds.append({"boxes": np.asarray(det.boxes[bi])[v],
                          "classes": np.asarray(det.classes[bi])[v],
                          "scores": np.asarray(det.scores[bi])[v]})
            t = targets[bi]
            tv = t[:, 0] >= 0
            gts.append({"boxes": t[tv][:, 1:], "classes": t[tv][:, 0]})
    return evaluate_detections(preds, gts, nc)
