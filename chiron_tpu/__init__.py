"""chiron-tpu: a TPU-native differentiable Markov-chain Monte Carlo engine.

A from-scratch rebuild of the capabilities of choderalab/chiron
(/root/reference), designed TPU-first:

* frozen pytree states + pure step functions (no mutable static-self jits),
* Langevin/MC propagation as ``lax.scan`` device loops with zero host
  round-trips per step, including on-device conditional neighbor rebuilds,
* forces are exact ``jax.grad`` of the energies (differentiable MCMC),
* fused Pallas pair kernels on the hot path (``chiron_tpu.ops``),
* replica-exchange multistate sampling sharded over a TPU mesh
  (``chiron_tpu.multistate`` / ``chiron_tpu.parallel``).
"""

__version__ = "0.1.0"

from . import units
from .space import OrthogonalNonPeriodicSpace, OrthogonalPeriodicSpace, Space
from .topology import Topology
from .utils import PRNG


def __getattr__(name):
    # Lazy submodule access (keeps `import chiron_tpu` light).
    import importlib

    submodules = {
        "analysis", "checkpoint", "config", "integrators", "io", "mcmc",
        "minimize", "multistate", "native", "neighbors", "observables",
        "ops", "parallel", "potential", "profiling", "reporters",
        "runtime", "states", "testsystems",
    }
    if name in submodules:
        return importlib.import_module(f".{name}", __name__)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = [
    "units",
    "Space",
    "OrthogonalPeriodicSpace",
    "OrthogonalNonPeriodicSpace",
    "Topology",
    "PRNG",
    "__version__",
]
