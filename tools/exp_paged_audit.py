"""Full-scale paged-table audit: gather exactness + weather-alignment oracle.

Round-5 result on a 176,256-frame 2-page collection (seed 0): ZERO checksum
mismatches over all rows (gather_rows_paged vs per-page dynamic_slice, both
a weighted and a plain checksum per row), and the weather-brightness oracle
shows 0.00% image<->label mismatch on 13/16 envs — the residual 0.73% sits
entirely in the three hardrain envs (dark-frame false positives of the
brightness threshold, NOT misalignment; night-labeled envs are at 0.00%).
This also retro-explains the 1.77% oracle reading on the round-5 r5a
collection (hardrain + night-lamp frames), which briefly looked like
corruption. The paged table is bit-faithful at scale; the >150k training
collapse must be sought in the training loop's interleaved dispatches, not
in the data or the reads (RESULTS_training.md round 5).

Usage: PYTHONPATH=/root/repo python tools/exp_paged_audit.py
"""
import numpy as np, time, json
t0=time.time()
def log(*a): print(f"[{time.time()-t0:6.1f}s]", *a, flush=True)
from cilrs_tpu.cli.common import build_map, enable_compilation_cache, require_accelerator
enable_compilation_cache(); require_accelerator()
import jax, jax.numpy as jnp
from cilrs_tpu.data.resident import collect_resident
from cilrs_tpu.ops.gather import gather_rows_paged

net = build_map("town01")
N = 176256
table, labels, stats = collect_resident(net, N, num_envs=16, num_vehicles=12,
                                        num_pedestrians=6, weather_idx=None, seed=0)
log("collected", stats["num_pages"], "pages, page_rows", table["page_rows"])
pages = table["images"]; pr = table["page_rows"]
D = 88*200*3

# 1) paged-gather exactness vs direct dynamic_slice reads, full sweep
@jax.jit
def sums_paged(p0, p1, idx):
    rows = gather_rows_paged((p0, p1), idx, pr).astype(jnp.uint32)
    w = (jnp.arange(rows.shape[1], dtype=jnp.uint32) % 251 + 1)
    return jnp.sum(rows * w, axis=1), jnp.sum(rows, axis=1)

@jax.jit
def sums_direct(pg, local):
    def one(i):
        r = jax.lax.dynamic_slice(pg, (i, 0, 0), (1,) + pg.shape[1:])
        r = r.reshape(-1).astype(jnp.uint32)
        w = (jnp.arange(r.shape[0], dtype=jnp.uint32) % 251 + 1)
        return jnp.sum(r * w), jnp.sum(r)
    return jax.vmap(one)(local)

B = 4096
bad = 0
means = np.zeros(N, np.float32)
for s in range(0, N, B):
    idx = np.arange(s, min(s + B, N), dtype=np.int32)
    hg, sg = (np.asarray(x) for x in sums_paged(pages[0], pages[1], jnp.asarray(idx)))
    pg_id = idx // pr; local = idx - pg_id * pr
    hd = np.zeros_like(hg); sd = np.zeros_like(sg)
    for p in (0, 1):
        m = pg_id == p
        if m.any():
            h2, s2 = (np.asarray(x) for x in sums_direct(pages[p], jnp.asarray(local[m])))
            hd[m] = h2; sd[m] = s2
    bad += int((hg != hd).sum() + (sg != sd).sum())
    means[s:s+len(idx)] = sg / (pages[0].shape[1]*128)
    if s % (B*8) == 0: log(f"swept {s}/{N} bad={bad}")
log(f"EXACTNESS: {bad} mismatching checksums over {N} rows (paged gather vs dynamic_slice)")

# 2) weather-brightness oracle + WHERE mismatches live
env = labels["env"]; night = (env % 5) == 3
med_n, med_d = np.median(means[night]), np.median(means[~night])
thr = 0.5*(med_n+med_d)
mism = (means < thr) != night
log(f"ORACLE: {mism.sum()}/{N} mismatches ({100*mism.mean():.2f}%), med_n={med_n:.1f} med_d={med_d:.1f}")
for lo in range(0, N, 20000):
    m = mism[lo:lo+20000]
    print(f"  rows {lo:>7}+: {100*m.mean():6.2f}%", flush=True)
# mismatch vs env and vs page
for p in (0,1):
    m = mism[(np.arange(N)//pr)==p]
    print(f"  page {p}: {100*m.mean():.2f}%")
by_env = [(e, round(100*mism[env==e].mean(),2)) for e in range(16)]
print("  by env:", by_env, flush=True)
