"""First-party training path (the reference trained offline in Colab via
ultralytics — x_arch/01_train_tokyo.ipynb; this replaces that workflow with
an in-framework, mesh-sharded JAX trainer).

Data-parallel by construction: params/opt-state replicated, image/target
batches sharded on dim 0 over the ``data`` mesh axis; gradients are averaged
by XLA's automatic psum when the jitted step runs under a Mesh with sharded
inputs (no hand-written collectives needed — the scaling-book recipe).
"""

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aerial_image_recognition_tpu.models.registry import ModelBundle
from aerial_image_recognition_tpu.ops.losses import yolov7_loss, xunet_loss
from aerial_image_recognition_tpu.ops.preprocess import preprocess_batch


@dataclass
class TrainState:
    params: Any          # {'params': ..., 'batch_stats': ...}
    opt_state: Any
    step: int = 0


def make_optimizer(lr: float = 1e-4, weight_decay: float = 5e-4):
    # lr0=1e-4 matches the notebook's training config (01_train_tokyo cell 14)
    return optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.adamw(lr, weight_decay=weight_decay),
    )


def make_train_step(bundle: ModelBundle, tx,
                    mesh: Optional[Mesh] = None,
                    axis_name: str = "data") -> Callable:
    """Returns jitted (state, images_u8 [B,S,S,3], targets [B,T,5]) → (state, metrics).

    Under a mesh, images/targets arrive sharded on dim 0 and XLA inserts the
    gradient all-reduce over ICI automatically.
    """
    module = bundle.module
    spec = bundle.spec

    def loss_fn(params, batch_stats, images_u8, targets):
        x = preprocess_batch(images_u8, out_size=spec.input_size,
                             dtype=jnp.bfloat16)
        variables = {"params": params, "batch_stats": batch_stats}
        outs, updates = module.apply(variables, x, train=True,
                                     mutable=["batch_stats"])
        if spec.family == "yolov7":
            loss, metrics = yolov7_loss(outs, targets, module.anchors,
                                        spec.num_classes)
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
        updates, new_opt = tx.update(grads, state["opt_state"], params)
        new_params = optax.apply_updates(params, updates)
        metrics = dict(metrics, loss=loss)
        return {"params": new_params, "batch_stats": new_bs,
                "opt_state": new_opt, "step": state["step"] + 1}, metrics

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P(axis_name))
        return jax.jit(step,
                       in_shardings=(repl, data, data),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,))
    return jax.jit(step, donate_argnums=(0,))


def init_train_state(bundle: ModelBundle, tx) -> Dict:
    variables = bundle.params
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return {"params": params, "batch_stats": batch_stats,
            "opt_state": tx.init(params), "step": 0}
