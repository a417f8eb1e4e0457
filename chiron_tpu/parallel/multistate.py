"""Mesh-propagated multistate sampling for homogeneous potential families.

The general :class:`chiron_tpu.multistate.MultiStateSampler` propagates
replicas one at a time on the host (API parity with reference
chiron/multistate.py:497-531).  For the common multistate workloads --
every state the same potential *family* with different parameters and/or
temperatures (e.g. a harmonic-k ladder for MBAR validation) -- this module
provides :class:`MeshMultiStateSampler`:

* per-state potential parameters stacked on a leading axis and treated as
  traced data (``chiron_tpu.potential.stack_homogeneous_params``), so ONE
  compiled chain serves every state;
* replica propagation as ``shard_map`` over the mesh's replica axis of a
  per-replica BAOAB chain (the parallel/tempering.py design, generalized
  to per-replica potential parameters);
* the R x S reduced-potential matrix as one ``vmap(vmap(...))`` call
  instead of the R*S host loop (SURVEY.md section 2, multistate row).

Falls back to the serial base-class path (with a log notice) when the
states are not a homogeneous family or the move schedule is not pure
Langevin dynamics.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec

from .. import units
from ..mcmc import LangevinDynamicsMove
from ..multistate import ReplicaExchangeSampler
from ..potential import stack_homogeneous_params
from .mesh import make_replica_mesh

log = logging.getLogger("chiron_tpu")


class MeshMultiStateSampler(ReplicaExchangeSampler):
    """Replica exchange with replicas sharded over a TPU mesh.

    Same API as :class:`chiron_tpu.multistate.ReplicaExchangeSampler`; the
    propagation and energy-matrix stages run device-parallel when possible.
    R must be divisible by the mesh size for the sharded path.
    """

    def __init__(self, mcmc_sampler, reporter=None,
                 mesh: Optional[Mesh] = None):
        super().__init__(mcmc_sampler=mcmc_sampler, reporter=reporter)
        self._mesh = mesh
        self._stacked = None     # (param_energy_fn, stacked_params) or None
        self._propagator = None  # compiled sharded chain
        self._ukn_fn = None

    # -- setup -----------------------------------------------------------
    def _allocate_variables(self, thermodynamic_states, sampler_states,
                            nbr_lists):
        super()._allocate_variables(
            thermodynamic_states, sampler_states, nbr_lists
        )
        self._try_build_stacked_path()

    def _langevin_only_move(self):
        moves = [m for _, m in self._mcmc_sampler[0].move.move_schedule]
        if len(moves) == 1 and isinstance(moves[0], LangevinDynamicsMove):
            return moves[0]
        return None

    def _try_build_stacked_path(self):
        potentials = [ts.potential for ts in self._thermodynamic_states]
        stacked = stack_homogeneous_params(potentials)
        if stacked is None:
            # heterogeneous ladder over any mix of REGISTERED potential
            # kinds (chiron_tpu.potential.register_potential_kind):
            # superset params + compact lax.switch, one compiled program
            from ..potential import stack_registered_params

            boxes = [s.box_vectors for s in self._sampler_states]
            box0 = boxes[0]
            same_box = all(
                (b is None and box0 is None)
                or (b is not None and box0 is not None
                    and bool(jnp.all(jnp.asarray(b) == jnp.asarray(box0))))
                for b in boxes
            )
            if same_box:
                box_diag = (None if box0 is None
                            else jnp.diagonal(jnp.asarray(box0)))
                stacked = stack_registered_params(potentials,
                                                  box_diag=box_diag)
        move = self._langevin_only_move()
        topo = next(
            (ts.potential.topology for ts in self._thermodynamic_states
             if getattr(ts.potential, "topology", None) is not None),
            None,
        )
        if stacked is None or move is None or topo is None:
            log.warning(
                "MeshMultiStateSampler: falling back to SERIAL per-replica "
                "propagation (a potential class is not registered via "
                "chiron_tpu.potential.register_potential_kind, parameter "
                "shapes are inconsistent, boxes mismatch, no topology for "
                "masses, or a non-Langevin move schedule) -- "
                "expect reference-grade performance for this ladder"
            )
            return
        if self._mesh is None:
            self._mesh = make_replica_mesh()
        R = self.number_of_replicas
        n_dev = self._mesh.devices.size
        if R % n_dev != 0:
            log.info(
                "MeshMultiStateSampler: %d replicas not divisible by mesh "
                "size %d; falling back to serial propagation", R, n_dev,
            )
            return
        param_energy_fn, params = stacked
        self._stacked = (param_energy_fn, params)
        self._topology = topo
        masses = jnp.asarray(topo.masses(), dtype=jnp.float32)[:, None]
        dt = units.strip_md(move.timestep, units.picosecond)
        gamma = units.strip_md(move.collision_rate, 1.0 / units.picosecond)
        a = jnp.exp(-gamma * dt)
        b = jnp.sqrt(1.0 - jnp.exp(-2.0 * gamma * dt))
        dt = jnp.float32(dt)

        def chain(x, v, key, kT, state_params, n_steps: int):
            """One replica's BAOAB chain; potential params are data."""
            force_fn = jax.grad(
                lambda p: -param_energy_fn(state_params, p)
            )
            sigma_v = jnp.sqrt(kT / masses)

            def step(carry, _):
                x, v, F, key = carry
                key, subkey = jax.random.split(key)
                v = v + (dt * 0.5) * F / masses
                x = x + (dt * 0.5) * v
                noise = jax.random.normal(subkey, x.shape, dtype=x.dtype)
                v = a * v + b * sigma_v * noise
                x = x + (dt * 0.5) * v
                F = force_fn(x)
                v = v + (dt * 0.5) * F / masses
                return (x, v, F, key), None

            (x, v, _, key), _ = jax.lax.scan(
                step, (x, v, force_fn(x), key), length=n_steps
            )
            return x, v, key

        mesh = self._mesh
        rep = PartitionSpec("replica")
        local_R = R // n_dev

        from jax import shard_map

        def propagate_local(x, v, keys, kTs, params_r, n_steps):
            if local_R == 1:
                sq = lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
                ex = lambda t: jax.tree_util.tree_map(lambda a: a[None], t)
                out = chain(sq(x), sq(v), sq(keys), sq(kTs), sq(params_r),
                            n_steps)
                return tuple(ex(o) for o in out)
            return jax.lax.map(
                lambda args: chain(*args, n_steps),
                (x, v, keys, kTs, params_r),
            )

        def sharded(x, v, keys, kTs, params_r, n_steps):
            f = shard_map(
                lambda *args: propagate_local(*args, n_steps),
                mesh=mesh,
                in_specs=(rep, rep, rep, rep, rep),
                out_specs=(rep, rep, rep),
                check_vma=False,
            )
            return f(x, v, keys, kTs, params_r)

        self._propagator = jax.jit(sharded, static_argnums=(5,))

        # u_kn in one call: E[r, s] = U(params_s, x_r); u = beta_s * E.
        # For the closed-set heterogeneous path, evaluate each KIND group
        # with its own branch function: vmapping the lax.switch would
        # lower to evaluate-all-branches + select (CLAUDE.md invariant),
        # running the O(N^2) LJ branch for every HO/ideal-gas column too.
        branches = getattr(param_energy_fn, "branches", None)
        kind_list = getattr(param_energy_fn, "kind_list", None)

        if branches is not None:
            groups = {}
            for s_idx, k in enumerate(kind_list):
                groups.setdefault(k, []).append(s_idx)
            groups = [(k, np.asarray(idxs)) for k, idxs in groups.items()]

            def ukn(xs, betas):
                R = xs.shape[0]
                S = len(kind_list)
                E = jnp.zeros((R, S), dtype=jnp.float32)
                for k, idxs in groups:
                    params_g = jax.tree_util.tree_map(
                        lambda a: a[idxs], params
                    )
                    fn = branches[k]
                    e = jax.vmap(
                        lambda x: jax.vmap(lambda p: fn(p, x))(params_g)
                    )(xs)  # (R, len(idxs))
                    E = E.at[:, idxs].set(e)
                return E * betas[None, :]
        else:
            def ukn(xs, betas):
                e_states = lambda x: jax.vmap(
                    lambda p: param_energy_fn(p, x)
                )(params)
                E = jax.vmap(e_states)(xs)  # (R, S)
                return E * betas[None, :]

        if any(ts.pressure is not None for ts in self._thermodynamic_states):
            # the stacked u_kn is beta_s * E only; states with pressure need
            # the beta*p*V term (reference states.py:275-325) -- keep the
            # sharded PROPAGATION but compute energies through the serial
            # reduced-potential path, which includes pV
            self._ukn_fn = None
            log.info(
                "MeshMultiStateSampler: pressure set on a state; energy "
                "matrix uses the serial reduced-potential path (includes "
                "beta*p*V), propagation stays sharded"
            )
        else:
            self._ukn_fn = jax.jit(ukn)
        log.info(
            "MeshMultiStateSampler: sharded path active (%d replicas on "
            "%d devices)", R, n_dev,
        )

    # -- stacked state marshalling ----------------------------------------
    def _gather_positions(self):
        return jnp.stack(
            [jnp.asarray(s.positions) for s in self._sampler_states]
        )

    def _gather_stacked(self):
        """Positions, velocities, and FRESH per-replica subkeys.

        Splits each replica's PRNG stream -- only the propagation stage may
        call this (a read-only stage like the energy matrix must use
        :meth:`_gather_positions`, or reproducibility would depend on how
        often energies are computed)."""
        xs = self._gather_positions()
        vs = []
        keys = []
        for s in self._sampler_states:
            v = s.velocities
            if v is None:
                v = jnp.zeros_like(jnp.asarray(s.positions))
            vs.append(jnp.asarray(v))
            keys.append(s.new_PRNG_key)
        return xs, jnp.stack(vs), jnp.stack(keys)

    # -- overridden stages -------------------------------------------------
    def _propagate_replicas(self) -> None:
        if self._propagator is None:
            # Serial fallback with the SAME per-iteration sampling as the
            # sharded path: one move-schedule sweep (number_of_moves steps)
            # per outer iteration.  Deliberate deviation from the base
            # class's reference-parity quirk, where ``n_iterations`` doubles
            # as the per-move sweep count (reference multistate.py:442+579,
            # quadratic in n_iterations) -- the two paths of THIS class must
            # sample identically or an R != n_devices ladder would silently
            # get a different amount of decorrelation than an R == n_devices
            # one.
            saved = self.number_of_iterations
            self.number_of_iterations = 1
            try:
                return super()._propagate_replicas()
            finally:
                self.number_of_iterations = saved
        xs, vs, keys = self._gather_stacked()
        move = self._langevin_only_move()
        n_steps = move.number_of_moves
        # per-replica thermodynamic state assignment (permuted by swaps)
        perm = np.asarray(self._replica_thermodynamic_states)
        kTs = jnp.asarray(
            [self._thermodynamic_states[s].kT_md for s in perm],
            dtype=jnp.float32,
        )
        _, params = self._stacked
        params_r = jax.tree_util.tree_map(
            lambda a: a[jnp.asarray(perm)], params
        )
        # fresh velocities at the assigned temperature when unset
        masses = jnp.asarray(
            self._topology.masses(), dtype=jnp.float32,
        )[:, None]
        draw = jax.vmap(
            lambda kT, key: jnp.sqrt(kT / masses) * jax.random.normal(
                key, xs.shape[1:]
            )
        )
        missing_v = np.asarray(
            [s.velocities is None for s in self._sampler_states]
        )
        if missing_v.any():
            # split each replica key: [1] seeds the velocities, [0] becomes
            # the chain key -- the chain's own first split then yields a
            # subkey INDEPENDENT of the velocity sample.  (Drawing from
            # split(k)[1] while also handing k to the chain would reuse the
            # exact key the chain derives for its first O-step noise:
            # integrators.py:210-212 documents the required independence.)
            split2 = jax.vmap(jax.random.split)(keys)
            vkeys = split2[:, 1]
            keys = split2[:, 0]
            # redraw ONLY the replicas that lack velocities -- overwriting
            # supplied ones would break chain continuity for the others
            vs = jnp.where(
                jnp.asarray(missing_v)[:, None, None], draw(kTs, vkeys), vs
            )
        xs, vs, keys = self._propagator(xs, vs, keys, kTs, params_r, n_steps)
        for r, s in enumerate(self._sampler_states):
            s.positions = xs[r]
            s.velocities = vs[r]
            s._current_PRNG_key = keys[r]
            self._traj[r].append(s.positions)
        for sid in perm:
            # bookkeeping parity with the serial fallback (one sweep of
            # number_of_moves steps per outer iteration)
            mv = self._mcmc_sampler[sid].move.move_schedule[0][1]
            mv._number_of_attempts_made += n_steps
            mv._move_iteration += 1
        if self._ukn_fn is None:
            # the serial energy-matrix fallback consumes the host neighbor
            # lists (calculate_reduced_potential_at_states), which nothing
            # on the sharded propagation path maintains -- refresh any that
            # have gone stale so u_kn never uses create()-time pair indices
            for r, s in enumerate(self._sampler_states):
                nl = self._nbr_lists[r]
                if (
                    nl is not None
                    and getattr(nl, "is_built", False)
                    and bool(nl.check(jnp.asarray(s.positions)))
                ):
                    nl.build(s.positions, s.box_vectors)

    def _compute_energies(self) -> None:
        if self._ukn_fn is None:
            return super()._compute_energies()
        xs = self._gather_positions()
        betas = jnp.asarray(
            [ts.beta_md for ts in self._thermodynamic_states],
            dtype=jnp.float32,
        )
        self._energy_thermodynamic_states = np.asarray(
            self._ukn_fn(xs, betas), dtype=np.float64
        )
