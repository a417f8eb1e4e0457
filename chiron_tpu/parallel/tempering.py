"""Replica-parallel tempering over a TPU mesh.

This is the flagship distributed workload (BASELINE.md: "64-replica parallel
tempering on v5e-8 with near-linear scaling") and is new capability relative
to the reference, whose MultiStateSampler loops replicas serially on the host
(reference chiron/multistate.py:497-510).

Design (TPU-first):

* All replica state is stacked on a leading axis R: positions (R, N, 3),
  velocities (R, N, 3), PRNG keys (R, 2), temperatures (R,).  One BAOAB
  chain is compiled with the temperature as *data*, so a single XLA program
  serves every temperature (no per-state closures / recompiles).
* Propagation = ``shard_map`` of ``vmap(chain)`` over the mesh's replica
  axis: each chip integrates its replica block independently -- embarrassing
  parallelism with zero inter-chip traffic during dynamics.
* Replica exchange needs only the per-replica potential energies U_r (an
  (R,)-vector, all-gathered over ICI implicitly by the out-sharding) plus a
  host-side even/odd sweep of the temperature ladder.  Swap traffic is O(R)
  scalars per iteration -- negligible vs. the dynamics, hence near-linear
  scaling.
* On a temperature swap the *temperatures move between replicas* (not the
  configurations), and velocities are rescaled by sqrt(T_new/T_old) so the
  kinetic energy stays consistent with the new ensemble.
"""

from __future__ import annotations

import logging
import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from .. import units
from ..analysis import MBAREstimator
from ..neighbors import (
    NeighborListNsqrd,
    PairListNsqrd,
    neighbor_build_fn,
    neighbor_check_fn,
)
from ..utils import initialize_velocities_md
from .mesh import make_replica_mesh

log = logging.getLogger("chiron_tpu")


def make_pt_chain_fn(
    energy_fn: Callable,
    masses: jnp.ndarray,
    timestep: float,
    collision_rate: float,
    pairs=None,
) -> Callable:
    """Single-replica BAOAB chain with temperature as a traced argument.

    Returns ``chain(x, v, key, box, list_state, kT, n_steps) ->
    (x, v, key, list_state, U_final, overflowed)``.
    """
    dt = jnp.float32(timestep)
    a = jnp.exp(-collision_rate * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * collision_rate * dt))
    force_fn = jax.grad(lambda x, s: -energy_fn(x, s))

    has_nbr = isinstance(pairs, NeighborListNsqrd)
    if has_nbr:
        space = pairs.space
        cutoff_and_skin = pairs.cutoff_md + pairs.skin_md
        skin = pairs.skin_md
        # capacity is read inside step() at trace time (not captured):
        # a host-side regrow after chain creation would otherwise make
        # the rebuild branch's shape disagree with the carried state
        # (same fix as integrators.make_baoab_step_fn)
    elif isinstance(pairs, PairListNsqrd):
        space = pairs.space
    else:
        space = None

    def chain(x, v, key, box, list_state, kT, n_steps: int):
        sigma_v = jnp.sqrt(kT / masses)

        def step(carry, _):
            x, v, F, key, list_state, overflowed = carry
            key, subkey = jax.random.split(key)
            v = v + (dt * 0.5) * F / masses
            x = x + (dt * 0.5) * v
            noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
            v = a * v + b * sigma_v * noise
            x = x + (dt * 0.5) * v
            if space is not None:
                x = space.wrap(x, box)
            if has_nbr:
                need = neighbor_check_fn(list_state, x, skin, space)
                list_state = jax.lax.cond(
                    need,
                    lambda: neighbor_build_fn(
                        x, box, cutoff_and_skin, space,
                        pairs.n_max_neighbors,
                    ),
                    lambda: list_state,
                )
                overflowed = overflowed | list_state.overflow
            F = force_fn(x, list_state)
            v = v + (dt * 0.5) * F / masses
            return (x, v, F, key, list_state, overflowed), None

        F0 = force_fn(x, list_state)
        (x, v, _, key, list_state, overflowed), _ = jax.lax.scan(
            step, (x, v, F0, key, list_state, jnp.asarray(False)),
            length=n_steps,
        )
        U = energy_fn(x, list_state)
        return x, v, key, list_state, U, overflowed

    return chain


def make_pt_dense_chain_fn(
    op,
    m_lane: jnp.ndarray,
    timestep: float,
    collision_rate: float,
    exact_forces: bool = False,
) -> Callable:
    """Single-replica BAOAB chain on the fused dense Pallas LJ kernel.

    State in the kernel's native (3, n_pad) layout; no neighbor machinery.
    Signature matches :func:`make_pt_chain_fn` (list_state is a dummy).
    """
    dt = jnp.float32(timestep)
    a = jnp.exp(-collision_rate * dt)
    b = jnp.sqrt(1.0 - jnp.exp(-2.0 * collision_rate * dt))

    def chain(x3, v3, key, box_diag, _list_state, kT, n_steps: int):
        sigma_v = jnp.sqrt(kT / m_lane)
        Lcol = box_diag.reshape(3, 1)

        def step(carry, _):
            x, v, F, key = carry
            key, subkey = jax.random.split(key)
            v = v + (dt * 0.5) * F / m_lane
            x = x + (dt * 0.5) * v
            noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
            v = a * v + b * sigma_v * noise
            x = x + (dt * 0.5) * v
            x = x - jnp.floor(x / Lcol) * Lcol
            F = op.force_only_t(x, box_diag, approx_recip=not exact_forces)
            v = v + (dt * 0.5) * F / m_lane
            return (x, v, F, key), None

        F0 = op.force_only_t(x3, box_diag, approx_recip=not exact_forces)
        (x3, v3, _, key), _ = jax.lax.scan(
            step, (x3, v3, F0, key), length=n_steps
        )
        _, U = op.force_energy_t(x3, box_diag)
        return x3, v3, key, _list_state, U, jnp.asarray(False)

    return chain


class ParallelTemperingSampler:
    """Parallel tempering with replicas sharded across a TPU mesh.

    Parameters
    ----------
    potential
        A chiron-tpu potential shared by all replicas (temperatures differ).
    temperatures
        The ladder, one entry per replica (list of Quantity or kelvin floats).
    timestep, collision_rate
        Langevin parameters (Quantity or MD-unit floats).
    pairs
        Optional NeighborListNsqrd/PairListNsqrd spec (template; per-replica
        state is built on device).
    mesh
        ``jax.sharding.Mesh`` with a ``replica`` axis.  Defaults to all
        local devices.  len(temperatures) must be divisible by mesh size.
    """

    def __init__(
        self,
        potential,
        temperatures: List,
        timestep=2.0 * units.femtoseconds,
        collision_rate=1.0 / units.picoseconds,
        pairs=None,
        mesh: Optional[Mesh] = None,
        reporter=None,
    ):
        self.potential = potential
        self.temps_md = np.array(
            [units.strip_md(t, units.kelvin) for t in temperatures],
            dtype=np.float32,
        )
        self.kTs = jnp.asarray(self.temps_md * units.kB_MD)
        self.n_replicas = len(self.temps_md)
        self.timestep = units.strip_md(timestep, units.picosecond)
        self.collision_rate = units.strip_md(
            collision_rate, 1.0 / units.picosecond
        )
        self.pairs = pairs
        self.mesh = mesh if mesh is not None else make_replica_mesh()
        n_dev = self.mesh.devices.size
        if self.n_replicas % n_dev != 0:
            raise ValueError(
                f"Number of replicas ({self.n_replicas}) must be divisible "
                f"by the mesh size ({n_dev})."
            )
        self._chain = None
        self._u_history: List[np.ndarray] = []
        self._temp_history: List[np.ndarray] = []
        self.n_accepted_swaps = 0
        self.n_proposed_swaps = 0
        self._iteration = 0
        self._estimator = MBAREstimator()
        self._reporter = reporter
        self._swap_seed = 0

    # -- setup ---------------------------------------------------------------
    def initialize(self, positions, box_vectors=None, masses=None, seed: int = 1234,
                   dense: Optional[bool] = None):
        """Stack R copies of the initial configuration and build lists.

        ``dense=None`` auto-selects the fused dense Pallas LJ kernel when no
        pair scheme was given, the potential is an LJ potential, and the
        system is periodic -- the fastest per-replica path on TPU.
        """
        if dense is None:
            dense = (
                self.pairs is None
                and box_vectors is not None
                and hasattr(self.potential, "sigma")
                and hasattr(self.potential, "cutoff")
            )
        if dense:
            return self._initialize_dense(positions, box_vectors, masses, seed)
        x0 = jnp.asarray(units.strip_md(positions, units.nanometer))
        if masses is None:
            masses = self.potential.topology.masses()
        self.masses = jnp.asarray(np.asarray(masses), dtype=jnp.float32)[:, None]

        R = self.n_replicas
        self.positions = jnp.tile(x0[None], (R, 1, 1))
        keys = jax.random.split(jax.random.PRNGKey(seed), R + 1)
        self.keys = keys[1:]
        # Per-replica Maxwell-Boltzmann velocities at each temperature.
        self.velocities = jax.vmap(
            lambda kT, key: initialize_velocities_md(
                kT / units.kB_MD, self.masses, key
            )
        )(self.kTs, self.keys)
        self.keys = jax.vmap(lambda k: jax.random.split(k)[0])(self.keys)

        if box_vectors is not None:
            box = jnp.asarray(units.strip_md(box_vectors, units.nanometer))
            self.box_vectors = jnp.tile(box[None], (R, 1, 1))
        else:
            self.box_vectors = None

        # Build per-replica list states (identical initially) on device.
        # With no box (non-periodic space), the list states carry the SAME
        # zeros (3, 3) box that propagate() substitutes for None -- the
        # chain's lax.cond rebuild branch must produce a pytree identical
        # in structure to the carried state, and non-periodic spaces
        # ignore the box value entirely (space.py OrthogonalNonPeriodicSpace).
        box_stack = (
            self.box_vectors if self.box_vectors is not None
            else jnp.zeros((R, 3, 3), dtype=jnp.float32)
        )
        if isinstance(self.pairs, NeighborListNsqrd):
            # Size capacity on the host build (grow-retry), then rebuild
            # the stacked states with the final capacity.
            self.pairs.build(x0, None if box_vectors is None else box)
            build = lambda x, b: neighbor_build_fn(
                x, b, self.pairs.cutoff_md + self.pairs.skin_md,
                self.pairs.space, self.pairs.n_max_neighbors,
            )
            self.list_state = jax.vmap(build)(self.positions, box_stack)
        elif isinstance(self.pairs, PairListNsqrd):
            from ..neighbors import pairlist_build_fn

            self.pairs.build(x0, None if box_vectors is None else box)
            self.list_state = jax.vmap(pairlist_build_fn)(
                self.positions, box_stack
            )
        else:
            self.list_state = None

        energy_fn = (
            self.potential.make_energy_fn(self.pairs)
            if self.pairs is not None
            else self.potential.make_energy_fn(None)
        )
        self._chain = make_pt_chain_fn(
            energy_fn, self.masses, self.timestep, self.collision_rate,
            pairs=self.pairs,
        )
        # only the Verlet-list chain contains a lax.cond (the rebuild
        # branch), which vmap would turn into a both-branches select;
        # every other chain is safely vmappable within a chip
        self._chain_vmappable = not isinstance(self.pairs, NeighborListNsqrd)
        self._build_sharded_propagator()

    def _initialize_dense(self, positions, box_vectors, masses, seed):
        """Dense-kernel replica setup: state in (R, 3, n_pad) layout."""
        from ..ops.lj_dense import LJDensePallas

        x0 = jnp.asarray(
            units.strip_md(positions, units.nanometer), dtype=jnp.float32
        )
        n = x0.shape[0]
        op = LJDensePallas(
            n=n,
            sigma=self.potential.sigma,
            epsilon=self.potential.epsilon,
            cutoff=self.potential.cutoff,
            tm=min(512, max(128, ((n + 127) // 128) * 128)),
        )
        self._dense_op = op
        n_pad = op.n_pad

        if masses is None:
            masses = self.potential.topology.masses()
        m_lane = jnp.ones((1, n_pad), dtype=jnp.float32)
        m_lane = m_lane.at[0, :n].set(
            jnp.asarray(np.asarray(masses), dtype=jnp.float32)
        )
        self.masses = m_lane

        R = self.n_replicas
        x3 = op.pad_positions(x0)
        self.positions = jnp.tile(x3[None], (R, 1, 1))
        keys = jax.random.split(jax.random.PRNGKey(seed), R + 1)
        self.keys = keys[1:]
        sigma_v = jnp.sqrt(self.kTs[:, None, None] / m_lane[None])
        self.velocities = sigma_v * jax.vmap(
            lambda k: jax.random.normal(k, (3, n_pad))
        )(self.keys)
        self.keys = jax.vmap(lambda k: jax.random.split(k)[0])(self.keys)

        box = jnp.asarray(
            units.strip_md(box_vectors, units.nanometer), dtype=jnp.float32
        )
        box_diag = jnp.diagonal(box).reshape(1, 3)
        self.box_vectors = jnp.tile(box_diag[None], (R, 1, 1))  # (R, 1, 3)
        self.list_state = jnp.zeros((R, 1), dtype=jnp.float32)  # dummy

        self._chain = make_pt_dense_chain_fn(
            op, m_lane, self.timestep, self.collision_rate
        )
        self._chain_vmappable = True
        self._build_sharded_propagator()

    def _build_sharded_propagator(self):
        """shard_map(vmap(chain)) over the replica axis of the mesh."""
        from jax import shard_map

        mesh = self.mesh
        P = PartitionSpec
        chain = self._chain

        local_R = self.n_replicas // mesh.devices.size
        vmappable = getattr(self, "_chain_vmappable", False)

        def propagate_local(x, v, keys, box, list_state, kTs, n_steps):
            # The Verlet-list chain contains a lax.cond (rebuild branch)
            # that vmap would turn into a both-branches select -- an
            # O(N^2) rebuild every step for every replica.  Those chains
            # run per-replica (direct call / lax.map, parallel across
            # chips).  Cond-free chains (dense kernel, pair list, bare
            # potentials) vmap across the chip's whole replica block,
            # recovering within-chip parallelism for small-N replicas.
            if local_R == 1:
                sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
                ex = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
                out = chain(
                    sq(x), sq(v), sq(keys), sq(box), sq(list_state),
                    sq(kTs), n_steps,
                )
                return tuple(ex(o) for o in out)
            if vmappable:
                return jax.vmap(
                    lambda *args: chain(*args, n_steps)
                )(x, v, keys, box, list_state, kTs)
            return jax.lax.map(
                lambda args: chain(*args, n_steps),
                (x, v, keys, box, list_state, kTs),
            )

        rep = P("replica")
        # Everything (incl. the dummy box when there is none) is stacked on
        # the replica axis and sharded.
        in_specs = (rep, rep, rep, rep, rep, rep)
        out_specs = (rep, rep, rep, rep, rep, rep)

        def sharded(x, v, keys, box, list_state, kTs, n_steps):
            f = shard_map(
                lambda *args: propagate_local(*args, n_steps),
                mesh=mesh,
                in_specs=in_specs,
                out_specs=out_specs,
                check_vma=False,
            )
            return f(x, v, keys, box, list_state, kTs)

        self._propagate = jax.jit(sharded, static_argnums=(6,))

    # -- one iteration --------------------------------------------------------
    def propagate(self, n_steps: int):
        """Advance every replica ``n_steps`` BAOAB steps (sharded)."""
        box = self.box_vectors if self.box_vectors is not None else (
            jnp.zeros((self.n_replicas, 3, 3))
        )
        ls = self.list_state
        if ls is None:
            # tree with a leading replica axis is required by the specs;
            # use a dummy zero array.
            ls = jnp.zeros((self.n_replicas, 1))
        (
            self.positions, self.velocities, self.keys, list_state,
            U, overflowed,
        ) = self._propagate(
            self.positions, self.velocities, self.keys, box, ls,
            self.kTs, n_steps,
        )
        if self.list_state is not None:
            self.list_state = list_state
        if bool(jnp.any(overflowed)):
            raise RuntimeError(
                "Neighbor capacity exceeded in a replica; increase "
                "n_max_neighbors."
            )
        return np.asarray(U)

    def mix_replicas(self, U: np.ndarray, rng: np.random.Generator):
        """Even/odd temperature-ladder swap sweep (host-side, O(R) work).

        Replica r at temperature index t(r); neighbors in *temperature*
        order are proposed.  Accept with
        P = min(1, exp((beta_i - beta_j)(U_i - U_j))) where i, j are the
        replicas currently at neighbor temperatures.
        """
        old_kTs = np.asarray(self.kTs)
        betas = 1.0 / old_kTs
        # replica currently at each temperature rank (coldest first)
        rank_of = np.argsort(old_kTs)
        offset = self._iteration % 2
        kTs = old_kTs.copy()
        for s in range(offset, self.n_replicas - 1, 2):
            i, j = rank_of[s], rank_of[s + 1]
            log_p = (betas[i] - betas[j]) * (U[i] - U[j])
            self.n_proposed_swaps += 1
            if log_p >= 0 or rng.uniform() < math.exp(log_p):
                kTs[i], kTs[j] = kTs[j], kTs[i]
                self.n_accepted_swaps += 1
        # Velocities follow the temperature: rescale by sqrt(T_new/T_old).
        scale = np.sqrt(kTs / old_kTs)
        self.velocities = self.velocities * jnp.asarray(scale)[:, None, None]
        self.kTs = jnp.asarray(kTs)

    # -- driver ---------------------------------------------------------------
    def run(self, n_iterations: int, steps_per_iteration: int = 100,
            seed=None):
        """PT loop: propagate (sharded) -> record energies -> swap.

        The swap RNG stream is derived per (seed, iteration), so a session
        restored from :meth:`save_session` continues bit-compatibly with
        the uninterrupted run.  ``seed=None`` (default) keeps the current
        swap seed -- in particular the one :meth:`load_session` restored;
        passing a seed explicitly overrides it (it would otherwise silently
        break the bit-compatible-resume contract).
        """
        seed = self._swap_seed if seed is None else seed
        self._swap_seed = seed
        for _ in range(n_iterations):
            self._iteration += 1
            U = self.propagate(steps_per_iteration)
            self._u_history.append(U)
            self._temp_history.append(np.asarray(self.kTs).copy())
            self._report_iteration(U)
            rng = np.random.default_rng([seed, self._iteration])
            self.mix_replicas(U, rng)
        if self._reporter is not None:
            self._reporter.flush_buffer()
        return self

    # -- reporting --------------------------------------------------------
    def _report_iteration(self, U: np.ndarray):
        """MultistateReporter integration: u_kn, state_index, step, and
        per-replica positions/boxes (reference reporter schema
        chiron/reporters.py:210-269)."""
        if self._reporter is None:
            return
        betas_ladder = 1.0 / np.sort(self.temps_md * units.kB_MD)
        data = {}
        props = self._reporter.properties_to_report
        if "u_kn" in props:
            data["u_kn"] = betas_ladder[:, None] * np.asarray(U)[None, :]
        if "state_index" in props:
            # temperature rank (coldest = 0) currently held by each replica
            order = np.argsort(np.argsort(np.asarray(self.kTs)))
            data["state_index"] = order
        if "step" in props:
            data["step"] = np.asarray(self._iteration)
        if "positions" in props:
            data["positions"] = np.asarray(self.replica_positions())
        if "box_vectors" in props and self.box_vectors is not None:
            b = np.asarray(self.box_vectors)
            if b.shape[1:] == (1, 3):  # dense path stores box diagonals
                boxes = np.zeros((b.shape[0], 3, 3), b.dtype)
                for a in range(3):
                    boxes[:, a, a] = b[:, 0, a]
                data["box_vectors"] = boxes
            else:
                data["box_vectors"] = b
        self._reporter.report(data)

    def replica_positions(self) -> np.ndarray:
        """(R, N, 3) positions regardless of the internal layout."""
        x = np.asarray(self.positions)
        if hasattr(self, "_dense_op"):
            n = self._dense_op.n
            return np.transpose(x[:, :, :n], (0, 2, 1))
        return x

    # -- session checkpoint -------------------------------------------------
    def save_session(self, path: str):
        """Persist the full PT session: replica state, kT ladder, swap
        statistics, PRNG keys, and recorded histories -- everything needed
        for :meth:`load_session` to continue bit-compatibly (SURVEY.md
        section 5 checkpoint/resume)."""
        from ..checkpoint import save_checkpoint

        tree = {
            "positions": self.positions,
            "velocities": self.velocities,
            "keys": self.keys,
            "kTs": self.kTs,
            "box_vectors": (
                self.box_vectors if self.box_vectors is not None
                else jnp.zeros((self.n_replicas, 0, 0))
            ),
            "list_state": (
                self.list_state if self.list_state is not None
                else jnp.zeros((self.n_replicas, 0))
            ),
            "u_history": (
                jnp.asarray(np.stack(self._u_history))
                if self._u_history else jnp.zeros((0, self.n_replicas))
            ),
            "temp_history": (
                jnp.asarray(np.stack(self._temp_history))
                if self._temp_history else jnp.zeros((0, self.n_replicas))
            ),
        }
        save_checkpoint(path, tree, metadata={
            "iteration": int(self._iteration),
            "n_accepted_swaps": int(self.n_accepted_swaps),
            "n_proposed_swaps": int(self.n_proposed_swaps),
            "swap_seed": int(self._swap_seed),
            "n_replicas": int(self.n_replicas),
        })

    def load_session(self, path: str):
        """Restore a session saved by :meth:`save_session` into this
        (identically constructed + initialized) sampler."""
        from ..checkpoint import load_checkpoint

        template = {
            "positions": self.positions,
            "velocities": self.velocities,
            "keys": self.keys,
            "kTs": self.kTs,
            "box_vectors": (
                self.box_vectors if self.box_vectors is not None
                else jnp.zeros((self.n_replicas, 0, 0))
            ),
            "list_state": (
                self.list_state if self.list_state is not None
                else jnp.zeros((self.n_replicas, 0))
            ),
            "u_history": jnp.zeros((0, self.n_replicas)),
            "temp_history": jnp.zeros((0, self.n_replicas)),
        }
        # leading dims of the histories are run-dependent, but unflattening
        # by template only needs matching STRUCTURE, not shapes
        tree, meta = load_checkpoint(path, like=template)
        if meta.get("n_replicas") != self.n_replicas:
            raise ValueError(
                f"checkpoint has {meta.get('n_replicas')} replicas, "
                f"sampler has {self.n_replicas}"
            )
        self.positions = tree["positions"]
        self.velocities = tree["velocities"]
        self.keys = tree["keys"]
        self.kTs = tree["kTs"]
        if self.box_vectors is not None:
            self.box_vectors = tree["box_vectors"]
        if self.list_state is not None:
            self.list_state = tree["list_state"]
        self._u_history = [np.asarray(r) for r in tree["u_history"]]
        self._temp_history = [np.asarray(r) for r in tree["temp_history"]]
        self._iteration = meta["iteration"]
        self.n_accepted_swaps = meta["n_accepted_swaps"]
        self.n_proposed_swaps = meta["n_proposed_swaps"]
        self._swap_seed = meta["swap_seed"]
        return meta

    @property
    def swap_acceptance_fraction(self) -> float:
        if self.n_proposed_swaps == 0:
            return 0.0
        return self.n_accepted_swaps / self.n_proposed_swaps

    # -- analysis -------------------------------------------------------------
    def compute_free_energies(self, discard_fraction: float = 0.2) -> np.ndarray:
        """MBAR free energies of the temperature ladder from the PT samples.

        u_kn[s, n] = beta_s * U_n over all recorded samples; each temperature
        generated exactly one sample per iteration (N_k uniform).
        """
        n_total = len(self._u_history)
        start = int(n_total * discard_fraction)
        kept = self._u_history[start:]
        if not kept:
            raise ValueError(
                f"no PT samples to analyze: {n_total} recorded iterations, "
                f"discard_fraction={discard_fraction} leaves zero -- call "
                "run() first or lower the fraction"
            )
        Us = np.concatenate(kept)
        betas_ladder = 1.0 / (np.sort(self.temps_md) * units.kB_MD)
        u_kn = betas_ladder[:, None] * Us[None, :]
        n_samples_per_temp = len(kept)
        N_k = np.full(self.n_replicas, n_samples_per_temp)
        # columns are iteration-major (n = t*R + r) and swap-mixed: tell
        # the estimator so bootstrap resamples iterations, not origin
        # blocks (which these columns are not)
        self._estimator.initialize(
            u_kn, N_k,
            iteration_layout=(n_samples_per_temp, self.n_replicas),
            iteration_major=True,
        )
        return self._estimator.f_k

    @property
    def f_k(self) -> np.ndarray:
        return self._estimator.f_k

    @property
    def estimator(self):
        """The MBAREstimator behind :meth:`compute_free_energies` --
        carries the full uncertainty surface (d_f_k, bootstrap_d_f_k
        with iteration resampling, overlap diagnostics, perturbed
        states)."""
        return self._estimator
