"""End-to-end render throughput on mid/large triangle scenes (the regime
the reference's QBVH owns — misc/performance.txt:30-31: 6.8 Mspps on 900k
tris, 24-thread CPU). Renders a grid-of-spheres mesh end to end through the
public API and prints Mspps per scene size. Run on TPU:
`python benchmarks/scene_throughput.py [tris...]` (default 38k 250k 1M)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from echorenderer_tpu.scene.entities import Scene
from echorenderer_tpu.scene.geometries import MeshEntity, PlaneEntity
from echorenderer_tpu.scene.lights import AmbientLight
from echorenderer_tpu.scene.cameras import PerspectiveCamera
from echorenderer_tpu.scene.materials import Diffuse, Emissive
from echorenderer_tpu.scene.prepare import prepare_scene
from echorenderer_tpu.processes.render import render, RenderProfile, EvaluationProfile


def sphere_grid_mesh(k: int, subdiv: int):
    """Indexed UV-sphere grid: k*k spheres, 2*subdiv^2 tris each."""
    nu = nv = subdiv
    u = np.linspace(0, 2 * np.pi, nu + 1)
    v = np.linspace(0, np.pi, nv + 1)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    pts = np.stack(
        [np.cos(uu) * np.sin(vv), np.cos(vv), np.sin(uu) * np.sin(vv)], -1
    ).reshape(-1, 3).astype(np.float32)
    idx = lambda i, j: i * (nv + 1) + j
    faces = []
    for i in range(nu):
        for j in range(nv):
            faces.append((idx(i, j), idx(i, j + 1), idx(i + 1, j + 1)))
            faces.append((idx(i, j), idx(i + 1, j + 1), idx(i + 1, j)))
    faces = np.asarray(faces, np.int32)
    rs = np.random.RandomState(0)
    all_v, all_f = [], []
    for gi in range(k):
        for gj in range(k):
            c = np.asarray([gi * 2.5, rs.uniform(0, 0.5) + 1.0, gj * 2.5], np.float32)
            s = rs.uniform(0.7, 1.1)
            all_f.append(faces + len(all_v) * 0 + sum(len(x) for x in all_v))
            all_v.append(pts * s + c)
    return np.concatenate(all_v, 0), np.concatenate(all_f, 0)


def build_scene(n_tris: int) -> Scene:
    # pick k/subdiv to land near the requested triangle count
    best = None
    for subdiv in range(8, 40):
        per = 2 * subdiv * subdiv
        k = max(1, int(round(np.sqrt(n_tris / per))))
        err = abs(k * k * per - n_tris)
        if best is None or err < best[0]:
            best = (err, k, subdiv)
    _, k, subdiv = best
    verts, faces = sphere_grid_mesh(k, subdiv)
    scene = Scene()
    scene.add(MeshEntity(vertices=verts, faces=faces, material=Diffuse(albedo=(0.7, 0.6, 0.5))))
    extent = k * 2.5
    scene.add(PlaneEntity(size=(extent * 4, extent * 4), material=Diffuse(albedo=(0.4, 0.4, 0.4))))
    scene.add(AmbientLight(intensity=(0.5, 0.6, 0.8)))
    cam = PerspectiveCamera(
        field_of_view=50.0,
        position=(extent * 0.5, extent * 0.8, -extent * 0.6),
    )
    cam.look_at((extent * 0.5, 0.0, extent * 0.5))
    scene.add(cam)
    return scene


def main(sizes=None):
    sizes = sizes or [int(float(a)) for a in sys.argv[1:]] or [38_000, 250_000, 1_000_000]
    res = (320, 180)
    for n in sizes:
        scene = build_scene(n)
        t0 = time.perf_counter()
        prepared = prepare_scene(scene)
        prep_s = time.perf_counter() - t0
        tris = prepared.geometry.num_triangles
        prof = RenderProfile(
            resolution=res,
            evaluations=(
                EvaluationProfile(
                    evaluator="path", samples_per_epoch=8, min_epoch=2, max_epoch=2,
                    bounce_limit=6, adaptive=False,
                ),
            ),
        )
        render(prepared, prof)  # compile warmup
        t0 = time.perf_counter()
        out = render(prepared, prof)
        info = out["__info__"]["main"]
        mspps = info["samples"] / (time.perf_counter() - t0) / 1e6
        print(
            f"{tris} tris: {mspps:.3f} Mspps @ {res[0]}x{res[1]} "
            f"(prep {prep_s:.1f}s, hier={'yes' if prepared.hier_soa is not None else 'no'})",
            flush=True,
        )


if __name__ == "__main__":
    main()
