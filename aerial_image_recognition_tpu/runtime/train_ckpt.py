"""Training-state checkpointing (orbax): params + optimizer + step.

The reference had no in-repo training, so nothing to resume; the notebook
relied on ultralytics' own .pt checkpoints (x_arch/01_train_tokyo.ipynb).
Here the full train state (params, batch_stats, optax state, step counter)
round-trips through orbax so multi-session training resumes exactly.
"""

import os
from typing import Dict


def save_train_state(state: Dict, path: str) -> None:
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    state = {k: v for k, v in state.items() if k != "history"}
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, template: Dict) -> Dict:
    """template: a state dict with the right pytree structure/shapes
    (e.g. a fresh init_train_state output)."""
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    template = {k: v for k, v in template.items() if k != "history"}
    return ckptr.restore(os.path.abspath(path), target=template)
