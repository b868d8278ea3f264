"""Offline training for the learned denoiser (processes/denoise.py).

Generates the dataset with THIS renderer (deterministic: scene generator +
seed fully define every frame), trains the kernel-predicting CNN on random
crops, and commits the weights to echorenderer_tpu/data/denoiser.npz.

Pairs: 16 spp noisy color + albedo/normal AOVs -> high-spp clean target,
over seed/parameter variations of the showcase scenes (the reference's
OIDN ships pre-trained weights; here the training set is reproducible from
the repo itself). Run on TPU: `python tools/train_denoiser.py [--steps N]`.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import optax

from echorenderer_tpu.models import scenes
from echorenderer_tpu.processes import denoise
from echorenderer_tpu.processes.render import (
    EvaluationProfile,
    RenderProfile,
    render,
)
from echorenderer_tpu.scene.prepare import prepare_scene

RES = (192, 128)
NOISY_SPP = 16
CLEAN_SPP = 1024
NOISY_VIEWS = 4
CROP = 64


def scene_variants():
    from echorenderer_tpu.scene.materials import Conductor, Dielectric, Diffuse

    yield "cornell", lambda: scenes.cornell_box()
    yield "cornell-dim", lambda: scenes.cornell_box(light_scale=0.35)
    yield "cornell-hot", lambda: scenes.cornell_box(light_scale=3.0)
    yield "ball-diffuse", lambda: scenes.material_ball()
    yield "ball-gold", lambda: scenes.material_ball(
        Conductor(albedo=(1.0, 0.75, 0.3), roughness=0.25)
    )
    yield "ball-glass", lambda: scenes.material_ball(
        Dielectric(albedo=(0.95, 0.95, 0.99), refractive_index=1.5)
    )
    yield "spheres-40", lambda: scenes.sphere_field(count=40, seed=11)
    yield "spheres-80", lambda: scenes.sphere_field(count=80, seed=3)
    yield "spheres-120", lambda: scenes.sphere_field(count=120, seed=29)
    yield "lights", lambda: scenes.many_lights(count=96, seed=5)


def render_frame(prepared, spp, seed):
    epochs = max(1, spp // 64)
    spe = spp // epochs
    prof = RenderProfile(
        resolution=RES,
        seed=seed,
        evaluations=(
            EvaluationProfile(
                evaluator="path", samples_per_epoch=spe, min_epoch=epochs,
                max_epoch=epochs, bounce_limit=8, adaptive=False,
                layer_name="main",
            ),
            EvaluationProfile(evaluator="albedo", layer_name="albedo"),
            EvaluationProfile(evaluator="normal_depth", layer_name="nd"),
        ),
    )
    out = render(prepared, prof)
    return (
        out["main"].astype(np.float32),
        out["albedo"].astype(np.float32),
        out["nd"][..., :3].astype(np.float32),
    )


def build_dataset(cache: str):
    """Per scene variant: one high-spp clean target + NOISY_VIEWS noisy
    renders at distinct seeds (shared clean amortizes the expensive
    render). Returns frame-aligned (noisy, albedo, normal, clean) stacks."""
    if os.path.exists(cache):
        d = np.load(cache)
        return [d[k] for k in ("noisy", "albedo", "normal", "clean")]
    noisy_l, alb_l, nrm_l, clean_l = [], [], [], []
    for name, make in scene_variants():
        t0 = time.perf_counter()
        prepared = prepare_scene(make())
        clean, _, _ = render_frame(prepared, CLEAN_SPP, seed=100)
        for seed in range(NOISY_VIEWS):
            noisy, alb, nrm = render_frame(prepared, NOISY_SPP, seed=seed * 7 + 1)
            noisy_l.append(noisy)
            alb_l.append(alb)
            nrm_l.append(nrm)
            clean_l.append(clean)
        print(f"  {name}: {time.perf_counter()-t0:.1f}s", flush=True)
    arrs = [np.stack(x) for x in (noisy_l, alb_l, nrm_l, clean_l)]
    np.savez_compressed(cache, noisy=arrs[0], albedo=arrs[1], normal=arrs[2], clean=arrs[3])
    return arrs


def build_eval_fixture(path: str):
    """Unseen-seed eval pairs on the three showcase scenes (the test gate
    tests/test_denoise.py compares learned vs bilateral on these)."""
    if os.path.exists(path):
        return
    packs = {}
    for name, make in (
        ("cornell", lambda: scenes.cornell_box()),
        ("ball", lambda: scenes.material_ball()),
        ("spheres", lambda: scenes.sphere_field(count=80, seed=3)),
    ):
        prepared = prepare_scene(make())
        noisy, alb, nrm = render_frame(prepared, NOISY_SPP, seed=53)
        clean, _, _ = render_frame(prepared, CLEAN_SPP, seed=900)
        packs[f"{name}_noisy"] = noisy
        packs[f"{name}_albedo"] = alb
        packs[f"{name}_normal"] = nrm
        packs[f"{name}_clean"] = clean
        print(f"  eval {name} done", flush=True)
    np.savez_compressed(path, **packs)


def tonemap(x):
    return jnp.log1p(jnp.maximum(x, 0.0))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--cache", default="/tmp/denoise_dataset_v2.npz")
    args = ap.parse_args()

    print("building dataset...", flush=True)
    noisy, albedo, normal, clean = build_dataset(args.cache)
    fixture = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "tests", "fixtures",
        "denoise_eval.npz",
    )
    build_eval_fixture(fixture)
    n_frames = noisy.shape[0]
    train_ids = np.arange(n_frames)
    print(f"dataset: {n_frames} frames {noisy.shape[1:]}", flush=True)

    params = denoise.init_params(jax.random.PRNGKey(0))
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    dn = jnp.asarray(noisy[train_ids])
    da = jnp.asarray(albedo[train_ids])
    dm = jnp.asarray(normal[train_ids])
    dc = jnp.asarray(clean[train_ids])

    def loss_fn(params, key):
        kf, ky, kx = jax.random.split(key, 3)
        f = jax.random.randint(kf, (args.batch,), 0, len(train_ids))
        y = jax.random.randint(ky, (args.batch,), 0, RES[1] - CROP)
        x = jax.random.randint(kx, (args.batch,), 0, RES[0] - CROP)

        def crop(img, fi, yi, xi):
            return jax.lax.dynamic_slice(img[fi], (yi, xi, 0), (CROP, CROP, 3))

        cn = jax.vmap(crop, (None, 0, 0, 0))(dn, f, y, x)
        ca = jax.vmap(crop, (None, 0, 0, 0))(da, f, y, x)
        cm = jax.vmap(crop, (None, 0, 0, 0))(dm, f, y, x)
        cc = jax.vmap(crop, (None, 0, 0, 0))(dc, f, y, x)
        out = denoise.apply(params, cn, ca, cm)
        return jnp.mean(jnp.abs(tonemap(out) - tonemap(cc)))

    @jax.jit
    def step(params, opt_state, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.PRNGKey(42)
    t0 = time.perf_counter()
    for i in range(args.steps):
        key, k = jax.random.split(key)
        params, opt_state, loss = step(params, opt_state, k)
        if i % 200 == 0 or i == args.steps - 1:
            print(f"step {i}: loss {float(loss):.4f} ({time.perf_counter()-t0:.0f}s)", flush=True)

    # --- evaluate on the unseen-seed showcase fixtures vs the bilateral ---
    from echorenderer_tpu.processes.composition import BilateralDenoise

    fx = np.load(fixture)
    for scene_name in ("cornell", "ball", "spheres"):
        hn = jnp.asarray(fx[f"{scene_name}_noisy"])
        ha = jnp.asarray(fx[f"{scene_name}_albedo"])
        hm = jnp.asarray(fx[f"{scene_name}_normal"])
        hc = jnp.asarray(fx[f"{scene_name}_clean"])
        learned = denoise.apply(params, hn[None], ha[None], hm[None])[0]
        bilateral = BilateralDenoise().apply(
            {"main": hn, "albedo": ha, "normal_depth": hm}
        )["main"]
        mse = lambda a: float(jnp.mean((tonemap(a) - tonemap(hc)) ** 2))
        print(f"{scene_name}: noisy {mse(hn):.6f}  bilateral {mse(bilateral):.6f}  learned {mse(learned):.6f}", flush=True)

    os.makedirs(os.path.dirname(denoise.WEIGHTS_PATH), exist_ok=True)
    np.savez(denoise.WEIGHTS_PATH, **{k: np.asarray(v) for k, v in params.items()})
    print(f"saved {denoise.WEIGHTS_PATH}", flush=True)


if __name__ == "__main__":
    main()
