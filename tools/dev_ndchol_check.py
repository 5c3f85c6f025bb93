"""Dev check: ndchol vs dense on a real lowered graph (CPU, f64)."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import sys

sys.path.insert(0, "/root/repo")

from rome_tpu import MvNormal, PriorPose2
from rome_tpu.io.g2o import load_g2o
from rome_tpu.graph.lower import lower
from rome_tpu.solvers.linearize import (
    linearize_all, dense_normal_eqs, normal_eq_entry_values, runtime_state,
    free_vector,
)
from rome_tpu.solvers.sparse import (
    symbolic_factor, ndchol_assemble, ndchol_factorize, ndchol_solve,
    ndchol_takahashi,
)

path = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/test/octagon.g2o"
fg = load_g2o(None, path)
fg.add_factor(["x0"], PriorPose2(MvNormal([0, 0, 0], [0.1, 0.1, 0.05])),
              graphinit=False)
fg.init_all()
ga = lower(fg, dtype=jnp.float64)
rt = runtime_state(ga)

import time

t0 = time.time()
dofs = {t: ga.manifolds[t].dof for t in ga.type_names}
batch_specs = [(b.vtypes, np.asarray(b.vslots)) for b in ga.batches]
sym = symbolic_factor(ga.type_names, ga.counts, dofs, batch_specs, leaf=16)
print("symbolic:", round(time.time() - t0, 3), "s", sym.stats)

lins = linearize_all(ga, ga.values0, rt)
lam = jnp.asarray(1e-3, jnp.float64)
jitter = 0.0

# dense reference
H, g = dense_normal_eqs(ga, lins, dtype=jnp.float64, rt=rt)
diag = jnp.maximum(jnp.diag(H), 1e-8)
Hd = H + lam * jnp.diag(diag)
d = 1.0 / jnp.sqrt(jnp.maximum(jnp.diag(Hd), 1e-12))
Hs = Hd * d[:, None] * d[None, :]
b = -g * d
x_dense = jnp.linalg.solve(Hs, b)

# ndchol
vals = normal_eq_entry_values(ga, lins, dtype=jnp.float64)
arrs = sym.device_arrs()
fvec = free_vector(ga, rt).astype(jnp.float64)
diag_H = jnp.zeros(sym.D, jnp.float64).at[arrs["diag_dst"]].add(
    vals[arrs["diag_src"]] * fvec[arrs["diag_dst"]] ** 2
)
dv = 1.0 / jnp.sqrt(jnp.maximum(diag_H * (1.0 + lam), 1e-12))
df = dv * fvec
diag_add = fvec * (lam / (1.0 + lam) + jitter) + (1.0 - fvec) * 1.0
Ws = ndchol_assemble(sym, arrs, vals, df, diag_add)
Linvs, L21s, L11s = ndchol_factorize(sym, arrs, Ws)
x_nd = ndchol_solve(sym, arrs, Linvs, L21s, b)

err = float(jnp.max(jnp.abs(x_nd - x_dense)))
rel = err / (float(jnp.max(jnp.abs(x_dense))) + 1e-30)
print("solve max abs err:", err, "rel:", rel)

# Takahashi vs dense inverse diag blocks
Xs = ndchol_takahashi(sym, arrs, Linvs, L21s)
Hinv = jnp.linalg.inv(Hs)
# check supernode diagonal entries
maxerr = 0.0
for l in range(sym.nlev):
    n_l, sm, bm = sym.plan[l]
    if n_l == 0 or Xs[l] is None:
        continue
    sup_idx = np.asarray(sym.arrs[f"sup_idx_{l}"])
    for j in range(n_l):
        for a in range(sm):
            ra = sup_idx[j, a]
            if ra >= sym.D:
                continue
            for bb in range(sm):
                rb = sup_idx[j, bb]
                if rb >= sym.D:
                    continue
                e = abs(float(Xs[l][j, a, bb]) - float(Hinv[ra, rb]))
                maxerr = max(maxerr, e)
print("takahashi supernode-block max abs err:", maxerr)
assert rel < 1e-8, "ndchol solve mismatch"
assert maxerr < 1e-8, "takahashi mismatch"
print("OK")
