"""Regenerate docs/renders/ showcase images with the current pipeline
(path tracing + AOVs + learned denoiser + ACES). Run on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from echorenderer_tpu.io import images
from echorenderer_tpu.models import scenes
from echorenderer_tpu.processes.composition import LearnedDenoise, ToneMapper
from echorenderer_tpu.processes.render import (
    EvaluationProfile,
    RenderProfile,
    render,
)
from echorenderer_tpu.scene.prepare import prepare_scene

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "docs", "renders")


def instanced_forest():
    """1,500 instances of a 3-prim pack — the TLAS showcase."""
    from echorenderer_tpu.scene import (
        AmbientLight, BoxEntity, Diffuse, EntityPack, PackInstance,
        PerspectiveCamera, PlaneEntity, Scene, SphereEntity,
    )
    from echorenderer_tpu.scene.materials import Conductor, Emissive

    pack = EntityPack()
    pack.add(BoxEntity(size=(0.12, 1.2, 0.12), material=Diffuse(albedo=(0.45, 0.3, 0.2)), position=(0, 0.6, 0)))
    pack.add(SphereEntity(radius=0.45, material=Diffuse(albedo=(0.15, 0.45, 0.2)), position=(0, 1.4, 0)))
    pack.add(SphereEntity(radius=0.05, material=Emissive(albedo=(10, 8, 4)), position=(0.3, 1.1, 0.2)))

    scene = Scene()
    rs = np.random.RandomState(11)
    for _ in range(1500):
        scene.add(PackInstance(
            pack,
            position=(rs.uniform(-28, 28), 0.0, rs.uniform(2, 70)),
            scale=float(rs.uniform(0.6, 1.6)),
            rotation=(0, float(rs.uniform(0, 360)), 0),
        ))
    scene.add(PlaneEntity(size=(220, 220), material=Diffuse(albedo=(0.34, 0.33, 0.3))))
    scene.add(SphereEntity(radius=1.3, material=Conductor(albedo=(0.95, 0.93, 0.9), roughness=0.03), position=(0, 1.3, 6)))
    scene.add(AmbientLight(intensity=(0.42, 0.5, 0.65)))
    cam = PerspectiveCamera(field_of_view=58, position=(0.5, 2.6, -4.0))
    cam.look_at((0, 1.0, 12))
    scene.add(cam)
    return scene


def main():
    # per-scene budgets keep every device program well under the ~60 s
    # TPU-worker limit (the instanced forest traces the TLAS kernel, which
    # is far slower per sample than the megakernel scenes)
    jobs = [
        ("cornell_box", lambda: scenes.cornell_box(), 640, 480, 32, 8, 8),
        ("material_ball", lambda: scenes.material_ball(), 640, 400, 32, 8, 8),
        ("instanced_forest", instanced_forest, 480, 300, 4, 6, 4),
    ]
    for name, make, w, h, spe, max_epoch, bounces in jobs:
        t0 = time.perf_counter()
        prepared = prepare_scene(make())
        prof = RenderProfile(
            resolution=(w, h),
            evaluations=(
                EvaluationProfile(
                    evaluator="path", samples_per_epoch=spe, min_epoch=2,
                    max_epoch=max_epoch, noise_threshold=0.08,
                    bounce_limit=bounces,
                ),
                EvaluationProfile(evaluator="albedo", layer_name="albedo"),
                EvaluationProfile(evaluator="normal_depth", layer_name="normal_depth"),
            ),
            composition=(LearnedDenoise(), ToneMapper(curve="aces")),
        )
        out = render(prepared, prof)
        images.save(os.path.join(OUT, f"{name}.png"), out["main"])
        info = out["__info__"]["main"]
        print(f"{name}: {info['samples']:,} samples, {time.perf_counter()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
