"""Standalone trace-throughput micro-benchmark: hierarchical packet kernel
vs dense kernel on 250k- and 1M-triangle meshes (the Echo.Experimental
TraceBenchmark analogue — reference misc/performance.txt rows). Run on TPU:
`python benchmarks/trace_throughput.py tiled`. Numbers (v5e, 2M rays):
250k tris: hier 13.4 Mrays/s trace / 38 Mrays/s occlude (dense: 1.7);
1M tris: hier 9.5 / 38."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

from echorenderer_tpu.ops.intersect import FlatGeometry
from echorenderer_tpu.ops import pallas_intersect as pi
from echorenderer_tpu.ops import pallas_hier as ph
from echorenderer_tpu.aggregation.bvh import build_bvh, geometry_bounds, intersect_bvh


def make_mesh(n_spheres_side, subdiv):
    """Grid of UV-spheres -> triangle soup with controllable count.
    Cached to /tmp (the python loops below cost minutes at 1M tris)."""
    cache = f"/tmp/mesh_{n_spheres_side}_{subdiv}.npz"
    if os.path.exists(cache):
        z = np.load(cache)
        return _soup_to_geom(z["v0"], z["e1"], z["e2"]), int(z["v0"].shape[0])
    return _make_mesh_uncached(n_spheres_side, subdiv, cache)


def _soup_to_geom(v0, e1, e2):
    t = v0.shape[0]
    z3 = np.zeros((t, 3), np.float32)
    z2 = np.zeros((t, 2), np.float32)
    return FlatGeometry(
        tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1), tri_e2=jnp.asarray(e2),
        tri_n0=jnp.asarray(z3), tri_n1=jnp.asarray(z3), tri_n2=jnp.asarray(z3),
        tri_uv0=jnp.asarray(z2), tri_uv1=jnp.asarray(z2), tri_uv2=jnp.asarray(z2),
        tri_mat=jnp.zeros(t, jnp.int32),
        sph_center=jnp.zeros((0, 3), jnp.float32),
        sph_radius=jnp.zeros((0,), jnp.float32),
        sph_mat=jnp.zeros(0, jnp.int32),
    )


def _make_mesh_uncached(n_spheres_side, subdiv, cache):
    # one uv sphere
    nu, nv = subdiv, subdiv
    u = np.linspace(0, 2 * np.pi, nu + 1)
    v = np.linspace(0, np.pi, nv + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    pts = np.stack([np.cos(uu) * np.sin(vv), np.cos(vv), np.sin(uu) * np.sin(vv)], -1)
    tris = []
    for i in range(nu):
        for j in range(nv):
            p00, p01 = pts[i, j], pts[i, j + 1]
            p10, p11 = pts[i + 1, j], pts[i + 1, j + 1]
            tris.append((p00, p01, p11))
            tris.append((p00, p11, p10))
    tris = np.asarray(tris, np.float32)  # (T, 3, 3)
    # instance into a grid
    k = n_spheres_side
    offs = np.stack(np.meshgrid(np.arange(k), np.arange(k), indexing="ij"), -1).reshape(-1, 2)
    all_tris = []
    rs = np.random.RandomState(0)
    for ox, oz in offs:
        c = np.asarray([ox * 2.5, rs.uniform(0, 0.5), oz * 2.5], np.float32)
        all_tris.append(tris * rs.uniform(0.7, 1.1) + c)
    soup = np.concatenate(all_tris, 0)
    v0 = np.ascontiguousarray(soup[:, 0])
    e1 = np.ascontiguousarray(soup[:, 1] - soup[:, 0])
    e2 = np.ascontiguousarray(soup[:, 2] - soup[:, 0])
    np.savez(cache, v0=v0, e1=e1, e2=e2)
    return _soup_to_geom(v0, e1, e2), v0.shape[0]


def camera_rays(n, k):
    """Coherent primary rays looking at the grid center."""
    side = int(np.sqrt(n))
    extent = k * 2.5
    eye = np.asarray([extent * 0.5, extent * 0.8, -extent * 0.6], np.float32)
    look = np.asarray([extent * 0.5, 0.0, extent * 0.5], np.float32)
    fwd = look - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0]); right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    xs = (np.arange(side) + 0.5) / side - 0.5
    gx, gy = np.meshgrid(xs, xs, indexing="ij")
    gx, gy = gx.reshape(-1), gy.reshape(-1)
    if len(sys.argv) > 1 and sys.argv[1] == "tiled":
        # 32x32 pixel tiles -> each 1024-ray block is a compact square
        ix = np.arange(side)
        tix, pix = ix // 32, ix % 32
        key = (tix[:, None] * (side // 32 + 1) + tix[None, :]) * 2048 + pix[:, None] * 32 + pix[None, :]
        ordr = np.argsort(key.reshape(-1), kind="stable")
        gx, gy = gx[ordr], gy[ordr]
    d = fwd[None, :] + 0.9 * (gx.reshape(-1, 1) * right + gy.reshape(-1, 1) * up)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.tile(eye, (d.shape[0], 1))
    pad = n - d.shape[0]
    if pad:
        o = np.concatenate([o, o[:pad]]); d = np.concatenate([d, d[:pad]])
    return jnp.asarray(o.astype(np.float32)), jnp.asarray(d.astype(np.float32))


def bench(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    n_rays = 2 ** 21  # 2M
    for label, k, subdiv in [("250k", 16, 22), ("1M", 23, 31)]:
        geom, t = make_mesh(k, subdiv)
        print(f"--- {label}: {t} tris ---", flush=True)
        bmin, bmax = geometry_bounds({k2: np.asarray(v) for k2, v in geom._asdict().items()})
        t0 = time.perf_counter()
        bvh = build_bvh(bmin, bmax)
        print(f"  bvh build: {time.perf_counter()-t0:.2f}s", flush=True)
        order = np.asarray(bvh.prim_order)
        t0 = time.perf_counter()
        hier = ph.build_hier_soa(geom, order)
        print(f"  hier build: {time.perf_counter()-t0:.2f}s  chunks={hier.num_chunks} stack={hier.stack_size}", flush=True)
        o, d = camera_rays(n_rays, k)
        ig = jnp.full((n_rays,), -1, jnp.int32)

        dt, hh = bench(lambda: ph.intersect_hier(geom, hier, o, d, jnp.inf, ig))
        print(f"  hier trace: {n_rays/dt/1e6:.2f} Mrays/s  hitrate={float(jnp.mean((hh.prim>=0)*1.0)):.3f}", flush=True)
        dt2, bb = bench(lambda: ph.occlude_hier(geom, hier, o, d, jnp.full((n_rays,), 5.0), ig))
        print(f"  hier occlude: {n_rays/dt2/1e6:.2f} Mrays/s", flush=True)

        if t <= 262144:
            soa = pi.build_prim_soa(geom, order=order)
            dt3, hd = bench(lambda: pi.intersect_pallas(geom, soa, o, d, jnp.inf, ig))
            print(f"  dense trace: {n_rays/dt3/1e6:.2f} Mrays/s", flush=True)
            agree = float(jnp.mean((hh.prim == hd.prim) * 1.0))
            print(f"  prim agreement hier vs dense: {agree:.5f}", flush=True)
        sys.stdout.flush()


if __name__ == "__main__":
    main()
