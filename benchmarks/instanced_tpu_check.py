"""Instanced binned traversal on REAL TPU: Mosaic compile of the
two-prefetch segment kernel + exact parity vs the packet walk.
Run from the repo root."""
import time, numpy as np, jax, jax.numpy as jnp, sys
jax.config.update('jax_compilation_cache_dir', '/tmp/jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, 'benchmarks'); sys.path.insert(0, '.')
from echorenderer_tpu.scene import EntityPack, PackInstance, PerspectiveCamera, Scene, MeshEntity, Diffuse
from echorenderer_tpu.scene.prepare import prepare_scene
from echorenderer_tpu.evaluation.scene_ops import trace, occlude, dispatch_summary
from echorenderer_tpu.ops.pallas_hier import intersect_hier
import scene_throughput as st

verts, faces = st.sphere_grid_mesh(8, 31)
pack = EntityPack()
pack.add(MeshEntity(vertices=verts, faces=faces, material=Diffuse(albedo=(0.7,0.6,0.5))))
scene = Scene()
for i, (dx, dz, s) in enumerate([(0,0,1.0),(25,0,0.8),(0,25,1.2),(25,25,0.9)]):
    scene.add(PackInstance(pack, position=(dx,0,dz), scale=s, rotation=(0, 17*i, 0)))
scene.add(PerspectiveCamera(position=(10,10,-30)))
prepared = prepare_scene(scene)
d = dispatch_summary(prepared)
print("dispatch:", d["accelerator"], "|", d["accelerator_reason"], flush=True)
n = 2**18
rs = np.random.RandomState(3)
o = jnp.asarray(rs.uniform(-5, 45, (n,3)).astype(np.float32))
dd = rs.normal(size=(n,3)).astype(np.float32)
dirs = jnp.asarray(dd/np.linalg.norm(dd,axis=-1,keepdims=True))
ig = jnp.full((n,), -1, jnp.int32)
t0 = time.perf_counter()
h = trace(prepared, o, dirs, jnp.inf, ig)
float(jnp.sum(h.t.ravel()[:8])); print(f"binned-instanced compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
h = trace(prepared, o, dirs, jnp.inf, ig); float(jnp.sum(h.t.ravel()[:8]))
dt = time.perf_counter()-t0
print(f"trace: {n/dt/1e6:.2f} Mrays/s  hit-rate {float(jnp.mean((h.prim>=0)*1.0)):.3f}", flush=True)
hp = intersect_hier(prepared.geometry, prepared.hier_soa, o[:8192], dirs[:8192], jnp.inf, ig[:8192])
agree = float(jnp.mean((h.prim[:8192] == hp.prim) * 1.0))
agree_i = float(jnp.mean(((h.inst[:8192] == hp.inst) | (hp.prim < 0)) * 1.0))
print(f"prim agreement vs packet: {agree:.6f}  inst: {agree_i:.6f}", flush=True)
t0 = time.perf_counter()
b = occlude(prepared, o, dirs, jnp.full((n,), 10.0), ig); float(jnp.sum(b.ravel()[:8].astype(jnp.float32)))
print(f"occlude ok {time.perf_counter()-t0:.1f}s", flush=True)
