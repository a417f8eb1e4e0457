"""Tile-granularity slot frontier at the flagship state point (N=4000).

How many pair slots would finer tile granularity buy the culled kernel if
the hardware could index sub-128-lane tiles for free?  Builds the
tile-pair list at a range of (tm, tn, sort key) granularities on the CPU
backend and reports slot counts vs the production config -- the data
behind BENCH.md's roofline argument (VERDICT r2 item 1).

Run: JAX_PLATFORM_NAME=cpu python benchmarks/slot_frontier.py
"""
import math

import numpy as np
import jax.numpy as jnp

from chiron_tpu import units
from chiron_tpu.ops.lj_cull import build_tile_pairs, slab_y_key, sort_by_key
from chiron_tpu.testsystems import LennardJonesFluid

N = 4000
CUTOFF, SLACK = 1.02, 0.2


def main():
    fluid = LennardJonesFluid(nparticles=N, reduced_density=0.8)
    pos = np.asarray(
        fluid.positions.value_in_unit_system(units.md_unit_system))
    box = np.diag(np.asarray(
        fluid.box_vectors.value_in_unit_system(units.md_unit_system)))
    L = float(box[0])
    rng = np.random.default_rng(3)
    pos = (pos + rng.normal(0, 0.05, pos.shape)) % L  # liquid-like
    bd = jnp.asarray(box, jnp.float32)

    def slots(tm, tn, nslab, cap):
        gran = math.lcm(tm, tn)
        n_pad = gran * ((N + gran - 1) // gran)
        x3 = jnp.zeros((3, n_pad), jnp.float32).at[:, :N].set(
            jnp.asarray(pos.T))
        x3 = jnp.where(jnp.arange(n_pad) < N, x3, x3[:, N - 1:N])
        key = slab_y_key(x3, N, nslab, L)
        x3s, _ = sort_by_key(key, x3, ())
        p = build_tile_pairs(x3s, N, tm, tn, bd, CUTOFF, SLACK,
                             capacity=cap)
        cnt = int(p.count[0, 0])
        assert not bool(p.overflowed)
        return cnt, cnt * tm * tn

    base = None
    for tm, tn, nslab, cap in [
        (128, 256, 0, 1024), (128, 128, 0, 2048), (32, 128, 0, 4096),
        (8, 128, 0, 16384), (32, 32, 0, 32768), (32, 32, 12, 32768),
        (16, 32, 12, 65536), (8, 32, 12, 131072),
    ]:
        cnt, s = slots(tm, tn, nslab, cap)
        if base is None:
            base = s
        print(f"tm={tm:>3} tn={tn:>3} nslab={nslab:>2}: entries={cnt:>7} "
              f"Mslots={s / 1e6:>6.2f} vs_prod={s / base:>5.2f}")
    d = pos[:, None, :] - pos[None, :, :]
    d -= L * np.round(d / L)
    r2 = (d * d).sum(-1)
    iu = np.triu_indices(N, 1)
    reach2 = (CUTOFF + SLACK) ** 2
    print("true in-reach ordered pairs (M):",
          round(float((r2[iu] < reach2).sum()) / 1e6, 3))


if __name__ == "__main__":
    main()
