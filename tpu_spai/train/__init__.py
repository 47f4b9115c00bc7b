"""Training workspaces and functional train loop (optax + orbax).

TPU-native replacement for the reference's Lightning stack (L5/L6):
`SimpleWorkspace`/`ScaledWorkspace`/`NeuralPCGWorkspace`/`NIFWorkspace`
mirror neural_cg/workspace.py, scaled_workspace.py and nif.py; `fit` is the
Trainer equivalent (epochs, val cadence, convergence oracles, checkpoints,
JSONL metrics).
"""

from .optim import create_optimizer
from .workspace import (
    SimpleWorkspace,
    ScaledWorkspace,
    NeuralPCGWorkspace,
    NIFWorkspace,
    get_workspace,
)
from .loop import fit, evaluate

__all__ = [
    "create_optimizer",
    "SimpleWorkspace",
    "ScaledWorkspace",
    "NeuralPCGWorkspace",
    "NIFWorkspace",
    "get_workspace",
    "fit",
    "evaluate",
]
