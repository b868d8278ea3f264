"""Scene preparation: mutable scene graph -> immutable device arrays.

Rebuild of the reference preparation pipeline (Scenic/Preparation/ScenePreparer.cs,
Aggregation/Preparation/PreparedPack.cs, PreparedScene.cs, LightCollection.cs):
  - walk the hierarchy computing world transforms (PackInstances are baked
    for now; two-level TLAS instancing is planned in aggregation/instancing)
  - extract flat SoA triangles/spheres (the PreparedTriangle v0/e1/e2 layout)
  - intern materials into a parameter table (SwatchExtractor analogue)
  - light census: explicit lights + emissive geometry, power-weighted
    selection CDF (flat version of the reference's LightPicker; the
    Estevez-Kulla light tree lands in aggregation/light_tree.py)
  - SAH BVH build over all primitives
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..aggregation.bvh import FlatBVH, build_bvh, geometry_bounds
from ..ops.intersect import FlatGeometry
from ..ops.pallas_hier import HIER_BUILD_MIN, build_hier_soa
from ..ops.pallas_intersect import build_prim_soa
from . import materials as mat_mod
from .cameras import Camera, PerspectiveCamera
from .entities import Entity, PackInstance, Scene
from .geometries import GeometryEntity
from .lights import AmbientLight, DirectionalLight, LightEntity, PointLight

_LUM = np.asarray([0.212671, 0.715160, 0.072169], np.float32)

# light record kinds in the selection table
LIGHT_POINT = 0
LIGHT_DIRECTIONAL = 1
LIGHT_AMBIENT = 2
LIGHT_EMISSIVE_TRI = 3


class PackedCamera(NamedTuple):
    kind: int  # static (pytree aux)
    position: jax.Array  # (3,)
    rotation: jax.Array  # (3, 3) local->world
    forward_length: jax.Array  # ()
    lens_radius: jax.Array
    focal_distance: jax.Array


jax.tree_util.register_pytree_node(
    PackedCamera,
    lambda c: ((c.position, c.rotation, c.forward_length, c.lens_radius, c.focal_distance), c.kind),
    lambda kind, xs: PackedCamera(kind, *xs),
)


class MaterialTable(NamedTuple):
    """Interned material parameter blocks (device). The fixed-size-block
    answer to the reference's arena-allocated polymorphic BSDFs
    (Common/Memory/Allocator.cs + Evaluation/Scattering/BSDF.cs).
    `present` (static) lists the material type ids in the scene so BSDF
    dispatch only compiles the models actually used."""

    type: jax.Array  # (M,) int32 material type id
    albedo: jax.Array  # (M, 3) linear RGB
    params: jax.Array  # (M, 4) [roughness, p1, p2, p3]
    extra: jax.Array  # (M, 3) e.g. conductor edge color
    one_sided: jax.Array  # (M,) int32 flag
    albedo_tex: jax.Array  # (M,) int32 texture id or -1
    present: tuple = ()  # static aux
    # static aux: (any albedo texture, any normal map, any roughness
    # texture) — lets trace-time dispatch (e.g. the megakernel) compile
    # texture stages only when the scene actually has them, without a
    # device readback
    tex_flags: tuple = (False, False, False)


jax.tree_util.register_pytree_node(
    MaterialTable,
    lambda m: (tuple(m[:6]), (m.present, m.tex_flags)),
    lambda aux, xs: MaterialTable(*xs, aux[0], aux[1]),
)


class LightTable(NamedTuple):
    """Flat light records + power CDF for selection, plus per-kind data."""

    kind: jax.Array  # (L,) int32
    index: jax.Array  # (L,) int32 into the per-kind arrays
    power: jax.Array  # (L,)
    cdf: jax.Array  # (L,) inclusive prefix of power / total
    point_pos: jax.Array  # (Lp, 3)
    point_intensity: jax.Array  # (Lp, 3)
    dir_dir: jax.Array  # (Ld, 3) direction the light travels (from light)
    dir_intensity: jax.Array  # (Ld, 3)
    emissive_prim: jax.Array  # (Le,) int32 original prim ids
    emissive_inst: jax.Array  # (Le,) int32 owning instance (0 unless TLAS)
    emissive_light: jax.Array  # (Le,) int32 back-map to light record index
    prim_light: jax.Array  # (P,) int32 prim -> light record or -1
    ambient_all: jax.Array  # (3,) constant env radiance (indirect rays)
    ambient_camera: jax.Array  # (3,) env radiance visible to camera rays
    # per textured ambient light e (record index e < E): rotation,
    # intensity scale, camera visibility and selection power. The constant
    # aggregate (ambient_all) owns record index E when present —
    # amb_const_power has shape (1,) then, (0,) otherwise (shape is the
    # STATIC presence flag usable under jit).
    env_rotation: jax.Array  # (E, 3, 3) world->env-local rotations
    env_scale: jax.Array  # (E, 3) per-env intensity scale
    env_camera: jax.Array  # (E,) 1.0 where directly visible to camera
    env_power: jax.Array  # (E,) selection power (mixture pdf weights)
    amb_const_power: jax.Array  # (0|1,) power of the constant record
    tree: object  # FlatLightTree over finite lights, or None (few lights)
    tree_records: jax.Array  # (F,) int32 tree light id -> light record
    record_tree: jax.Array  # (L,) int32 light record -> tree light id or -1

    @property
    def num_lights(self) -> int:
        return self.kind.shape[0]


# finite-light count above which the Estevez-Kulla tree replaces the flat
# power CDF. The tree descent costs ~30x a flat CDF pick per wave on TPU,
# so it only pays where the flat pick's variance hurts: many lights
LIGHT_TREE_THRESHOLD = 64


class PreparedScene(NamedTuple):
    """Immutable render-ready world (reference PreparedScene.cs)."""

    geometry: FlatGeometry
    bvh: FlatBVH
    materials: MaterialTable
    lights: LightTable
    camera: PackedCamera
    env_maps: tuple  # tuple of prepared directional textures (pytree'd)
    tex_atlas: jax.Array  # (T, R, R, 4) resampled albedo textures
    prim_soa: object  # PrimSoA kernel layout (ops/pallas_intersect.py)
    # packed per-prim shading rows: one gather fetches everything `interact`
    # needs (the TPU analogue of the reference's contiguous PreparedTriangle)
    # tri: [geo_n(3) n0(3) n1(3) n2(3) uv0(2) uv1(2) uv2(2) mat area 0]
    # sph: [center(3) radius .. mat area 1]
    shade_pack: jax.Array  # (P, 24) float32
    # packed material rows: [albedo(3) params(4) extra(3) type tex one_sided]
    mat_pack: jax.Array  # (M, 16) float32
    # packed emissive-light rows: [v0(3) e1(3) e2(3) n(3) albedo(3) area is_sph]
    emissive_pack: jax.Array  # (Le, 20) float32
    # hierarchical kernel tables (ops/pallas_hier.HierSoA) for scenes with
    # >= HIER_BUILD_MIN padded prims; None below that
    hier_soa: object = None
    # TLAS instancing tables (scene/instancing.InstanceTable) when the scene
    # contains shared packs; None for fully baked scenes. When set, geometry
    # and shade_pack rows for instanced prims are in pack-LOCAL space and
    # all tracing goes through the instanced hierarchical kernel.
    instances: object = None


# resolution each albedo texture is resampled to in the device atlas; a
# single fixed size keeps the shading gather one fused lookup (the
# reference's per-texture ImportGrid sizes have no TPU-friendly analogue)
ATLAS_RES = 256


def _resample_texture(tex, res: int = ATLAS_RES) -> np.ndarray:
    """Host bilinear resample of a Texture's data() to (res, res, 4)."""
    src = np.asarray(tex.data(), np.float32)
    if src.ndim == 2:
        src = src[..., None]
    if src.shape[-1] == 1:
        src = np.repeat(src, 3, -1)
    if src.shape[-1] == 3:
        src = np.concatenate([src, np.ones_like(src[..., :1])], -1)
    h, w = src.shape[:2]
    v = (np.arange(res, dtype=np.float32) + 0.5) / res * h - 0.5
    u = (np.arange(res, dtype=np.float32) + 0.5) / res * w - 0.5
    v0 = np.clip(np.floor(v).astype(np.int64), 0, h - 1)
    u0 = np.clip(np.floor(u).astype(np.int64), 0, w - 1)
    v1 = np.minimum(v0 + 1, h - 1)
    u1 = np.minimum(u0 + 1, w - 1)
    fv = np.clip(v - v0, 0.0, 1.0)[:, None, None]
    fu = np.clip(u - u0, 0.0, 1.0)[None, :, None]
    top = src[v0][:, u0] * (1 - fu) + src[v0][:, u1] * fu
    bot = src[v1][:, u0] * (1 - fu) + src[v1][:, u1] * fu
    return top * (1 - fv) + bot * fv


def _iter_world(entity: Entity, parent, swatch, stop_shared=None, inst_specs=None):
    """Depth-first walk yielding (entity, world_matrix, swatch). When
    `stop_shared` (a set of pack ids) is given, PackInstances of those packs
    are NOT descended into — an instance spec (pack, world, merged swatch)
    is appended to `inst_specs` instead (the TLAS path)."""
    world = parent @ entity.transform.matrix()
    yield entity, world, swatch
    if isinstance(entity, PackInstance):
        merged = {**swatch, **{id(k): v for k, v in entity.material_swatch.items()}}
        if stop_shared is not None and id(entity.pack) in stop_shared:
            inst_specs.append((entity.pack, world, merged))
        else:
            for child in entity.pack.children:
                yield from _iter_world(child, world, merged, stop_shared, inst_specs)
    for child in entity.children:
        yield from _iter_world(child, world, swatch, stop_shared, inst_specs)


class Collector:
    """Accumulates flattened entities from one walk (the root scene in
    world space, or one shared pack in local space)."""

    def __init__(self):
        self.tri_v, self.tri_f, self.tri_n, self.tri_uv, self.tri_m = [], [], [], [], []
        self.sph_c, self.sph_r, self.sph_m = [], [], []
        self.cameras: list[tuple[Camera, np.ndarray]] = []
        self.point_lights, self.dir_lights, self.ambient_lights = [], [], []
        self.mat_pairs: list[tuple[object, int]] = []  # (entity mat obj, gid)

    def add(self, entity, world, swatch, intern):
        if isinstance(entity, GeometryEntity):
            mat = swatch.get(id(entity.material), entity.material)
            mid = intern(mat)
            # (object, gid, internally-swatched): an instance-level swatch
            # may later remap gid unless an inner swatch already claimed it
            self.mat_pairs.append((entity.material, mid, id(entity.material) in swatch))
            tris = entity.extract_triangles(world)
            if tris is not None and len(tris["faces"]):
                base = sum(len(v) for v in self.tri_v)
                self.tri_v.append(np.asarray(tris["vertices"], np.float32))
                self.tri_f.append(np.asarray(tris["faces"], np.int32) + base)
                n = tris.get("normals")
                u = tris.get("uvs")
                self.tri_n.append(None if n is None else np.asarray(n, np.float32))
                self.tri_uv.append(None if u is None else np.asarray(u, np.float32))
                if tris.get("face_materials") is not None:
                    # per-face materials (multi-material OBJ): intern each,
                    # -1 entries fall back to the entity material
                    fm = np.asarray(tris["face_materials"], np.int32)
                    sub = []
                    for m in tris["materials"]:
                        g = intern(swatch.get(id(m), m))
                        sub.append(g)
                        self.mat_pairs.append((m, g, id(m) in swatch))
                    table = np.asarray(sub + [mid], np.int32)
                    self.tri_m.append(table[np.where(fm >= 0, fm, len(sub))])
                else:
                    self.tri_m.append(np.full(len(tris["faces"]), mid, np.int32))
            sph = entity.extract_sphere(world)
            if sph is not None:
                self.sph_c.append(np.asarray(sph[0], np.float32))
                self.sph_r.append(np.float32(sph[1]))
                self.sph_m.append(np.int32(mid))
        elif isinstance(entity, Camera):
            self.cameras.append((entity, world))
        elif isinstance(entity, PointLight):
            self.point_lights.append(
                (world[:3, 3].astype(np.float32), entity.intensity, entity.power)
            )
        elif isinstance(entity, DirectionalLight):
            d = world[:3, :3] @ np.asarray([0.0, 0.0, 1.0])
            d = (d / np.linalg.norm(d)).astype(np.float32)
            self.dir_lights.append((d, entity.intensity, entity))
        elif isinstance(entity, AmbientLight):
            rot = world[:3, :3] / max(np.linalg.norm(world[:3, 0]), 1e-20)
            self.ambient_lights.append((entity, rot.astype(np.float32)))


def build_material_arrays(materials):
    """Interned material list -> packed parameter arrays + texture atlas
    (dedupe albedo + normal-map textures, resample each to ATLAS_RES;
    normal maps share the atlas, ids disambiguate)."""
    mtypes = np.asarray([m.type_id for m, _ in materials], np.int32)
    malbedo = np.stack([m.constant_albedo() for m, _ in materials], 0)
    mparams = np.stack([m.params() for m, _ in materials], 0)
    mextra = np.stack([m.extra_color() for m, _ in materials], 0)
    mone = np.asarray([os for _, os in materials], np.int32)

    mtex = np.full(len(materials), -1, np.int32)
    mntex = np.full(len(materials), -1, np.int32)
    mnint = np.zeros(len(materials), np.float32)
    mrtex = np.full(len(materials), -1, np.int32)
    atlas_slices: list[np.ndarray] = []
    tex_ids: dict[int, int] = {}

    def intern_tex(tex) -> int:
        key = id(tex)
        if key not in tex_ids:
            tex_ids[key] = len(atlas_slices)
            atlas_slices.append(_resample_texture(tex))
        return tex_ids[key]

    for mi, (m, _) in enumerate(materials):
        tex = m.albedo_texture() if hasattr(m, "albedo_texture") else None
        if tex is not None:
            mtex[mi] = intern_tex(tex)
        ntex = getattr(m, "normal", None)
        if ntex is not None and hasattr(ntex, "data"):
            mntex[mi] = intern_tex(ntex)
            mnint[mi] = float(getattr(m, "normal_intensity", 1.0))
        rtex = m.roughness_texture() if hasattr(m, "roughness_texture") else None
        if rtex is not None:
            mrtex[mi] = intern_tex(rtex)
    tex_atlas = (
        np.stack(atlas_slices, 0)
        if atlas_slices
        else np.zeros((0, 1, 1, 4), np.float32)
    )
    # quantize texel values to bf16-representable f32: the megakernel
    # fetches texels through 0/1 one-hot MXU matmuls, which are EXACT at
    # default (single-pass bf16) precision only for bf16-representable
    # operands — quantizing ONCE here keeps the XLA wavefront and the
    # megakernel reading identical values (bit-matched images). Error
    # <= 2^-9 relative, far below 8-bit source quantization.
    if tex_atlas.size:
        import ml_dtypes

        tex_atlas = tex_atlas.astype(ml_dtypes.bfloat16).astype(np.float32)
    return mtypes, malbedo, mparams, mextra, mone, mtex, mntex, mnint, mrtex, tex_atlas


def _assemble_shade(tri_rows, sph_rows, *, num_prims, num_tris):
    """Host assembly of the (P, 24) shade_pack layout + ONE upload.

    History (keep): r3 moved this on-device because host first-touch ran
    at ~10-25 MB/s; r5 fixed the allocator instead (utils/hostmem.py),
    and the device program's FIRST-USE cost per process (~2.7 s even on a
    persistent-cache hit — executable load through the remote tunnel,
    benchmarks/prep_fine.py) dwarfed the ~0.1 s it saved. Host slice
    writes at warm-arena speed + a single ~600 MB/s h2d transfer win."""
    shade = np.zeros((num_prims, 24), np.float32)
    if num_tris:
        gn, n0, n1, n2, uv0, uv1, uv2, tmat, area = tri_rows
        shade[:num_tris, 0:3] = gn
        shade[:num_tris, 3:6] = n0
        shade[:num_tris, 6:9] = n1
        shade[:num_tris, 9:12] = n2
        shade[:num_tris, 12:14] = uv0
        shade[:num_tris, 14:16] = uv1
        shade[:num_tris, 16:18] = uv2
        shade[:num_tris, 18] = tmat
        shade[:num_tris, 19] = area
    if num_prims > num_tris:
        c, r, m = sph_rows
        shade[num_tris:, 0:3] = c
        shade[num_tris:, 3] = r
        shade[num_tris:, 18] = m
        shade[num_tris:, 19] = 4.0 * np.pi * r * r
        shade[num_tris:, 20] = 1.0
    return jnp.asarray(shade)


def assemble_triangles(tri_v, tri_f, tri_n, tri_uv, tri_m):
    """Indexed triangle lists -> flat per-face arrays
    (v0, e1, e2, n0, n1, n2, uv0, uv1, uv2, tmat)."""
    # f32 from the start: the renderer is f32 end to end, and this host is
    # first-touch page-fault bound (~10-25 MB/s — r3 profile), so the f64
    # vertex temporaries roughly doubled assembly time at 1M tris
    verts = np.concatenate([np.asarray(v, np.float32) for v in tri_v], 0)
    faces = np.concatenate(tri_f, 0)
    # per-vertex normals/uvs with per-chunk fallbacks
    norms = []
    uvs = []
    for v, n, u in zip(tri_v, tri_n, tri_uv):
        norms.append(
            np.zeros((len(v), 3), np.float32)
            if n is None else np.asarray(n, np.float32)
        )
        uvs.append(
            np.zeros((len(v), 2), np.float32)
            if u is None else np.asarray(u, np.float32)
        )
    vn = np.concatenate(norms, 0)
    vuv = np.concatenate(uvs, 0)
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    e1, e2 = v1 - v0, v2 - v0
    gn = np.cross(e1, e2)
    gn /= np.maximum(np.linalg.norm(gn, axis=-1, keepdims=True), 1e-20)
    n0, n1, n2 = vn[faces[:, 0]], vn[faces[:, 1]], vn[faces[:, 2]]
    # faces without shading normals fall back to the geometric normal
    for arr in (n0, n1, n2):
        missing = np.linalg.norm(arr, axis=-1) < 1e-6
        arr[missing] = gn[missing]
    uv0, uv1, uv2 = vuv[faces[:, 0]], vuv[faces[:, 1]], vuv[faces[:, 2]]
    tmat = np.concatenate(tri_m, 0)
    return v0, e1, e2, n0, n1, n2, uv0, uv1, uv2, tmat


def subdivide_triangles(parts: dict, threshold: float, max_iteration: int = 3):
    """4-way midpoint subdivision of triangles whose area exceeds
    `threshold` (reference TriangleEntity.GetSubdivided:190-267 +
    PreparedPack.SubdivideSingle:54-69 — oversized triangles, typically
    ground planes, otherwise inflate acceleration bounds). Vectorized over
    the whole soup, one level per pass. `parts` holds per-face arrays
    (v0, e1, e2, n0, n1, n2, uv0, uv1, uv2, tmat); returns the same dict."""
    for _ in range(max_iteration):
        v0, e1, e2 = parts["v0"], parts["e1"], parts["e2"]
        area = 0.5 * np.linalg.norm(np.cross(e1, e2), axis=-1)
        split = area > threshold
        if not split.any():
            break
        keep = {k: v[~split] for k, v in parts.items()}
        s = {k: v[split] for k, v in parts.items()}

        def lerp3(a, b):
            m = 0.5 * (a + b)
            n = np.linalg.norm(m, axis=-1, keepdims=True)
            return m / np.maximum(n, 1e-20)

        # corners and midpoints (positions exact, normals renormalized,
        # uvs linear — the reference's barycentric interpolation)
        A, B, C = s["v0"], s["v0"] + s["e1"], s["v0"] + s["e2"]
        Mab, Mbc, Mca = 0.5 * (A + B), 0.5 * (B + C), 0.5 * (C + A)
        nA, nB, nC = s["n0"], s["n1"], s["n2"]
        nab, nbc, nca = lerp3(nA, nB), lerp3(nB, nC), lerp3(nC, nA)
        uA, uB, uC = s["uv0"], s["uv1"], s["uv2"]
        uab, ubc, uca = 0.5 * (uA + uB), 0.5 * (uB + uC), 0.5 * (uC + uA)

        children = [
            (A, Mab, Mca, nA, nab, nca, uA, uab, uca),
            (Mab, B, Mbc, nab, nB, nbc, uab, uB, ubc),
            (Mca, Mbc, C, nca, nbc, nC, uca, ubc, uC),
            (Mab, Mbc, Mca, nab, nbc, nca, uab, ubc, uca),
        ]
        new = {k: [keep[k]] for k in parts}
        for (a, b, c, na, nb, nc, ua, ub, uc) in children:
            new["v0"].append(a.astype(np.float32))
            new["e1"].append((b - a).astype(np.float32))
            new["e2"].append((c - a).astype(np.float32))
            new["n0"].append(na.astype(np.float32))
            new["n1"].append(nb.astype(np.float32))
            new["n2"].append(nc.astype(np.float32))
            new["uv0"].append(ua.astype(np.float32))
            new["uv1"].append(ub.astype(np.float32))
            new["uv2"].append(uc.astype(np.float32))
            new["tmat"].append(s["tmat"])
        parts = {k: np.concatenate(v, 0) for k, v in new.items()}
    return parts


def _unrolled_prim_estimate(scene: Scene) -> int | None:
    """Total primitive count if every PackInstance were baked, or None when
    an unknown GeometryEntity subclass makes the count unknowable without
    extraction. Used by the small-scene auto-bake below."""
    from .geometries import (
        BoxEntity,
        GeometryEntity,
        MeshEntity,
        PlaneEntity,
        SphereEntity,
        TriangleEntity,
    )

    unknown = False

    def count(entity) -> int:
        nonlocal unknown
        total = 0
        if isinstance(entity, MeshEntity):
            total += len(entity.faces)
        elif isinstance(entity, (TriangleEntity, SphereEntity)):
            total += 1
        elif isinstance(entity, PlaneEntity):
            total += 2
        elif isinstance(entity, BoxEntity):
            total += 12
        elif isinstance(entity, GeometryEntity):
            unknown = True
        if isinstance(entity, PackInstance):
            total += count(entity.pack)
        for child in entity.children:
            total += count(child)
        return total

    n = count(scene)
    return None if unknown else n


def _shared_packs(scene: Scene, instancing: str) -> set[int]:
    """ids of EntityPacks that get a shared BLAS + per-instance transforms
    instead of baking: every pack referenced by >= 2 PackInstances in
    "auto" mode, every instanced pack in "tlas" mode, none in "bake".

    Small-scene auto-bake (VERDICT r4 item #5): in "auto" mode a TLAS
    scene whose UNROLLED primitive count fits the fused megakernel's
    limit is baked instead — baking is the tested oracle (identical
    radiance), duplicating <= 2048 prims costs nothing, and the baked
    scene rides the 14x fused path that TLAS dispatch would forfeit.
    Callers that need `Hit.inst` ids can force instancing="tlas"."""
    if instancing == "bake":
        return set()
    counts: dict[int, int] = {}

    def walk(entity):
        if isinstance(entity, PackInstance):
            counts[id(entity.pack)] = counts.get(id(entity.pack), 0) + 1
            for child in entity.pack.children:
                walk(child)
        for child in entity.children:
            walk(child)

    walk(scene)
    need = 1 if instancing == "tlas" else 2
    shared = {pid for pid, c in counts.items() if c >= need}
    if shared and instancing == "auto":
        from ..ops.megakernel import MEGA_PRIM_LIMIT

        est = _unrolled_prim_estimate(scene)
        if est is not None and est <= MEGA_PRIM_LIMIT:
            return set()
    return shared


def prepare_scene(
    scene: Scene,
    camera_name: str | None = None,
    instancing: str = "auto",
    subdivide: float | None = None,
) -> PreparedScene:
    from ..utils.hostmem import warm_host_allocator

    warm_host_allocator()  # idempotent; prep is host-page-fault bound
    shared = _shared_packs(scene, instancing)
    if shared:
        from .instancing import prepare_scene_instanced

        return prepare_scene_instanced(scene, camera_name, shared)

    materials: list = []
    mat_index: dict[int, int] = {}

    def intern(mat) -> int:
        one_sided = 0
        if isinstance(mat, mat_mod.OneSided):
            one_sided, mat = 1, mat.base
        key = (id(mat), one_sided)
        if key not in mat_index:
            mat_index[key] = len(materials)
            materials.append((mat, one_sided))
        return mat_index[key]

    col = Collector()
    for entity, world, swatch in _iter_world(scene, np.eye(4), {}):
        col.add(entity, world, swatch, intern)
    tri_v, tri_f, tri_n, tri_uv, tri_m = col.tri_v, col.tri_f, col.tri_n, col.tri_uv, col.tri_m
    sph_c, sph_r, sph_m = col.sph_c, col.sph_r, col.sph_m
    cameras = col.cameras
    point_lights, dir_lights, ambient_lights = (
        col.point_lights, col.dir_lights, col.ambient_lights
    )

    # --- assemble flat geometry ---
    if tri_v:
        v0, e1, e2, n0, n1, n2, uv0, uv1, uv2, tmat = assemble_triangles(
            tri_v, tri_f, tri_n, tri_uv, tri_m
        )
        if subdivide is not None:
            # split oversized triangles for acceleration quality (the
            # reference applies GetSubdivided during PreparedPack build)
            parts = subdivide_triangles(
                dict(v0=v0, e1=e1, e2=e2, n0=n0, n1=n1, n2=n2,
                     uv0=uv0, uv1=uv1, uv2=uv2, tmat=tmat),
                float(subdivide),
            )
            v0, e1, e2 = parts["v0"], parts["e1"], parts["e2"]
            n0, n1, n2 = parts["n0"], parts["n1"], parts["n2"]
            uv0, uv1, uv2 = parts["uv0"], parts["uv1"], parts["uv2"]
            tmat = parts["tmat"]
    else:
        # degenerate far-away invisible triangle keeps shapes non-empty
        mid = intern(mat_mod.Invisible())
        v0 = np.asarray([[1e7, 1e7, 1e7]], np.float32)
        e1 = np.asarray([[1e-3, 0, 0]], np.float32)
        e2 = np.asarray([[0, 1e-3, 0]], np.float32)
        n0 = n1 = n2 = np.asarray([[0, 0, 1]], np.float32)
        uv0 = uv1 = uv2 = np.zeros((1, 2), np.float32)
        tmat = np.asarray([mid], np.int32)

    geom_np = dict(
        tri_v0=v0, tri_e1=e1, tri_e2=e2,
        tri_n0=n0, tri_n1=n1, tri_n2=n2,
        tri_uv0=uv0, tri_uv1=uv1, tri_uv2=uv2,
        tri_mat=tmat,
        sph_center=np.stack(sph_c, 0) if sph_c else np.zeros((0, 3), np.float32),
        sph_radius=np.asarray(sph_r, np.float32) if sph_r else np.zeros(0, np.float32),
        sph_mat=np.asarray(sph_m, np.int32) if sph_m else np.zeros(0, np.int32),
    )
    num_tris = geom_np["tri_v0"].shape[0]
    num_prims = num_tris + geom_np["sph_center"].shape[0]

    # --- material table ---
    (mtypes, malbedo, mparams, mextra, mone, mtex, mntex, mnint, mrtex,
     tex_atlas) = build_material_arrays(materials)

    # --- light census ---
    kinds, indices, powers = [], [], []
    for i, (pos, inten, power) in enumerate(point_lights):
        kinds.append(LIGHT_POINT)
        indices.append(i)
        powers.append(max(power, 1e-6))
    for i, (d, inten, ent) in enumerate(dir_lights):
        kinds.append(LIGHT_DIRECTIONAL)
        indices.append(i)
        powers.append(max(float(np.pi * _LUM @ inten), 1e-6))

    # Each textured AmbientLight becomes its OWN light record (index = env
    # map id) with its own rotation/intensity/visibility; constant ambient
    # lights aggregate into one record at index E (reference: every
    # InfiniteLight is prepared independently, InfiniteLight.cs:18).
    ambient_all = np.zeros(3, np.float32)
    ambient_camera = np.zeros(3, np.float32)
    env_maps: list = []
    env_rotations: list = []
    env_scales: list = []
    env_cameras: list = []
    env_powers: list = []
    for ent, rot in ambient_lights:
        if ent.texture is not None:
            e = len(env_maps)
            prepared = ent.texture.prepare()
            env_maps.append(prepared)
            env_rotations.append(rot.T)  # world -> env local
            env_scales.append(np.asarray(ent.intensity, np.float32))
            env_cameras.append(1.0 if ent.directly_visible else 0.0)
            power = 4.0 * np.pi * (
                float(prepared.mean_luminance()) * float(_LUM @ ent.intensity) * 3.0
            )
            env_powers.append(max(power, 1e-6))
            kinds.append(LIGHT_AMBIENT)
            indices.append(e)
            powers.append(max(power, 1e-6))
        else:
            ambient_all += ent.intensity
            if ent.directly_visible:
                ambient_camera += ent.intensity
    amb_const_power = np.zeros(0, np.float32)
    if float(ambient_all.sum()) > 0.0:
        kinds.append(LIGHT_AMBIENT)
        indices.append(len(env_maps))  # index E = the constant record
        p_c = max(float(4.0 * np.pi * (_LUM @ ambient_all)), 1e-6)
        powers.append(p_c)
        amb_const_power = np.asarray([p_c], np.float32)

    # emissive geometry census (LightCollection.cs:23 analogue), vectorized
    # over the material-id arrays (a python per-prim loop costs minutes on
    # multi-hundred-k-triangle scenes)
    emissive_prims = []
    # geometric normals + areas computed ONCE and reused by the shade pack
    # below (this host first-touches fresh allocations at ~10-25 MB/s, so
    # a duplicated 1M-row cross costs seconds — profiled r3)
    geo_normal = np.cross(geom_np["tri_e1"], geom_np["tri_e2"])
    tri_area2 = np.linalg.norm(geo_normal, axis=-1)
    geo_normal /= np.maximum(tri_area2[:, None], 1e-20)
    tri_area = 0.5 * tri_area2
    mat_power = np.asarray(
        [
            m.power if isinstance(m, mat_mod.Emissive) else 0.0
            for m, _ in materials
        ],
        np.float64,
    )
    tri_power = mat_power[geom_np["tri_mat"]]
    for p in np.nonzero(tri_power > 0.0)[0]:
        emissive_prims.append((int(p), float(tri_power[p] * tri_area[p] * np.pi)))
    if geom_np["sph_center"].shape[0]:
        sph_power = mat_power[geom_np["sph_mat"]]
        sph_area = 4.0 * np.pi * geom_np["sph_radius"].astype(np.float64) ** 2
        for s in np.nonzero(sph_power > 0.0)[0]:
            emissive_prims.append(
                (num_tris + int(s), float(sph_power[s] * sph_area[s] * np.pi))
            )

    emissive_light = []
    for p, power in emissive_prims:
        emissive_light.append(len(kinds))
        kinds.append(LIGHT_EMISSIVE_TRI)
        indices.append(len(emissive_light) - 1)
        powers.append(max(power, 1e-6))

    if not kinds:  # degenerate: inject a black ambient (PreparedScene.cs:291)
        kinds, indices, powers = [LIGHT_AMBIENT], [0], [1e-6]

    powers = np.asarray(powers, np.float64)
    cdf = np.cumsum(powers / powers.sum()).astype(np.float32)
    cdf[-1] = 1.0

    prim_light = np.full(num_prims, -1, np.int32)
    for (p, _), lrec in zip(emissive_prims, emissive_light):
        prim_light[p] = lrec

    # --- Estevez-Kulla light tree over finite lights (LightTree.cs:20) ---
    record_tree = np.full(len(kinds), -1, np.int32)
    tree = None
    tree_records = np.zeros(0, np.int32)
    finite: list[tuple[int, np.ndarray, float, np.ndarray, float, float, float]] = []
    for rec, (k, idx) in enumerate(zip(kinds, indices)):
        if k == LIGHT_POINT:
            pos = point_lights[idx][0]
            finite.append((rec, pos, 0.0, np.asarray([0.0, 0.0, 1.0]), np.pi, np.pi / 2, powers[rec]))
        elif k == LIGHT_EMISSIVE_TRI:
            p = emissive_prims[idx][0]
            if p < num_tris:
                v0 = geom_np["tri_v0"][p]
                v1 = v0 + geom_np["tri_e1"][p]
                v2 = v0 + geom_np["tri_e2"][p]
                c = (v0 + v1 + v2) / 3.0
                r = float(max(np.linalg.norm(v0 - c), np.linalg.norm(v1 - c), np.linalg.norm(v2 - c)))
                nrm = np.cross(geom_np["tri_e1"][p], geom_np["tri_e2"][p])
                nrm = nrm / max(np.linalg.norm(nrm), 1e-20)
                finite.append((rec, c, r, nrm, 0.0, np.pi / 2, powers[rec]))
            else:
                s = p - num_tris
                c = geom_np["sph_center"][s]
                r = float(geom_np["sph_radius"][s])
                finite.append((rec, c, r, np.asarray([0.0, 0.0, 1.0]), np.pi, np.pi / 2, powers[rec]))
    if len(finite) >= LIGHT_TREE_THRESHOLD:
        from ..aggregation.light_tree import build_light_tree

        tree_records = np.asarray([f[0] for f in finite], np.int32)
        for ti, f in enumerate(finite):
            record_tree[f[0]] = ti
        tree = build_light_tree(
            center=np.stack([f[1] for f in finite], 0),
            radius=np.asarray([f[2] for f in finite]),
            axis=np.stack([f[3] for f in finite], 0),
            theta_o=np.asarray([f[4] for f in finite]),
            theta_e=np.asarray([f[5] for f in finite]),
            power=np.asarray([f[6] for f in finite]),
        )

    lights = LightTable(
        kind=jnp.asarray(kinds, jnp.int32),
        index=jnp.asarray(indices, jnp.int32),
        power=jnp.asarray(powers, jnp.float32),
        cdf=jnp.asarray(cdf),
        point_pos=jnp.asarray(
            np.stack([p for p, _, _ in point_lights], 0) if point_lights else np.zeros((0, 3), np.float32)
        ),
        point_intensity=jnp.asarray(
            np.stack([i for _, i, _ in point_lights], 0) if point_lights else np.zeros((0, 3), np.float32)
        ),
        dir_dir=jnp.asarray(
            np.stack([d for d, _, _ in dir_lights], 0) if dir_lights else np.zeros((0, 3), np.float32)
        ),
        dir_intensity=jnp.asarray(
            np.stack([i for _, i, _ in dir_lights], 0) if dir_lights else np.zeros((0, 3), np.float32)
        ),
        emissive_prim=jnp.asarray(
            np.asarray([p for p, _ in emissive_prims], np.int32) if emissive_prims else np.zeros(0, np.int32)
        ),
        emissive_inst=jnp.zeros(len(emissive_prims), jnp.int32),
        emissive_light=jnp.asarray(np.asarray(emissive_light, np.int32) if emissive_light else np.zeros(0, np.int32)),
        prim_light=jnp.asarray(prim_light),
        ambient_all=jnp.asarray(ambient_all),
        ambient_camera=jnp.asarray(ambient_camera),
        env_rotation=jnp.asarray(
            np.stack(env_rotations, 0) if env_rotations
            else np.zeros((0, 3, 3), np.float32)
        ),
        env_scale=jnp.asarray(
            np.stack(env_scales, 0) if env_scales
            else np.zeros((0, 3), np.float32)
        ),
        env_camera=jnp.asarray(np.asarray(env_cameras, np.float32)),
        env_power=jnp.asarray(np.asarray(env_powers, np.float32)),
        amb_const_power=jnp.asarray(amb_const_power),
        tree=tree,
        tree_records=jnp.asarray(tree_records),
        record_tree=jnp.asarray(record_tree),
    )

    # --- camera ---
    cam_entity, cam_world = None, np.eye(4)
    for c, w in cameras:
        if camera_name is None or c.name == camera_name:
            cam_entity, cam_world = c, w
            break
    if cam_entity is None:
        cam_entity = PerspectiveCamera()
    packed = cam_entity.pack(cam_world)
    camera = PackedCamera(
        kind=int(packed["kind"]),
        position=jnp.asarray(packed["position"]),
        rotation=jnp.asarray(packed["rotation"]),
        forward_length=jnp.asarray(packed["forward_length"]),
        lens_radius=jnp.asarray(packed["lens_radius"]),
        focal_distance=jnp.asarray(packed["focal_distance"]),
    )

    # --- BVH --- (host_out avoids ~15 s/array device readbacks below)
    bmin, bmax = geometry_bounds(geom_np)
    bvh_host: dict = {}
    bvh = build_bvh(bmin, bmax, host_out=bvh_host)

    geometry = FlatGeometry(**{k: jnp.asarray(v) for k, v in geom_np.items()})
    # host-side twin for the kernel-layout builders: reading the device
    # arrays back costs ~5 s per transfer through the TPU tunnel
    geom_host = FlatGeometry(**geom_np)
    from ..ops.pallas_intersect import pack_sorted_prims

    packed = pack_sorted_prims(
        geom_host, np.asarray(bvh_host["prim_order"], np.int32),
        bounds=(bmin, bmax),
    )
    mats = MaterialTable(
        type=jnp.asarray(mtypes),
        albedo=jnp.asarray(malbedo),
        params=jnp.asarray(mparams),
        extra=jnp.asarray(mextra),
        one_sided=jnp.asarray(mone),
        albedo_tex=jnp.asarray(mtex),
        present=tuple(
            sorted(
                {int(t) for t in np.unique(mtypes)}
                # OneSided wrappers turn backface hits into pass-through
                | ({mat_mod.INVISIBLE} if mone.any() else set())
            )
        ),
        tex_flags=(
            bool((mtex >= 0).any()),
            bool((mntex >= 0).any()),
            bool((mrtex >= 0).any()),
        ),
    )
    # --- packed shading rows (single-gather interact) ---
    # assembled ON DEVICE and inside ONE jitted program: the (P, 24) host
    # buffer alone cost ~10 s of first-touch page faults at 1M prims
    # (profiled r3), and the EAGER .at[].set chain cost ~5 s of
    # per-op tunnel dispatches each materializing the 96 MB array
    # (profiled r4) — fused, it is one compile-cached program
    shade = _assemble_shade(
        (
            geo_normal.astype(np.float32), geom_np["tri_n0"],
            geom_np["tri_n1"], geom_np["tri_n2"], geom_np["tri_uv0"],
            geom_np["tri_uv1"], geom_np["tri_uv2"],
            geom_np["tri_mat"].astype(np.float32),
            (0.5 * tri_area2).astype(np.float32),
        ),
        (
            geom_np["sph_center"], geom_np["sph_radius"],
            geom_np["sph_mat"].astype(np.float32),
        ),
        num_prims=num_prims, num_tris=num_tris,
    )

    mat_pack = np.zeros((len(materials), 16), np.float32)
    mat_pack[:, 0:3] = malbedo
    mat_pack[:, 3:7] = mparams
    mat_pack[:, 7:10] = mextra
    mat_pack[:, 10] = mtypes
    mat_pack[:, 11] = mtex
    mat_pack[:, 12] = mone
    mat_pack[:, 13] = mntex  # normal-map atlas id or -1
    mat_pack[:, 14] = mnint  # normal-map intensity
    mat_pack[:, 15] = mrtex  # roughness-texture atlas id or -1

    epack = np.zeros((max(len(emissive_prims), 1), 20), np.float32)
    for i, (p, _) in enumerate(emissive_prims):
        if p < num_tris:
            epack[i, 0:3] = geom_np["tri_v0"][p]
            epack[i, 3:6] = geom_np["tri_e1"][p]
            epack[i, 6:9] = geom_np["tri_e2"][p]
            epack[i, 9:12] = geo_normal[p]
            epack[i, 15] = 0.5 * tri_area2[p]
        else:
            s = p - num_tris
            epack[i, 0:3] = geom_np["sph_center"][s]
            epack[i, 3] = geom_np["sph_radius"][s]
            epack[i, 15] = 4.0 * np.pi * float(geom_np["sph_radius"][s]) ** 2
            epack[i, 16] = 1.0
        mi = geom_np["tri_mat"][p] if p < num_tris else geom_np["sph_mat"][p - num_tris]
        epack[i, 12:15] = malbedo[mi]
    if not emissive_prims:
        epack = epack[:0]

    return PreparedScene(
        geometry=geometry,
        bvh=bvh,
        materials=mats,
        lights=lights,
        camera=camera,
        env_maps=tuple(env_maps),
        tex_atlas=jnp.asarray(tex_atlas),
        # kernel prim layout in BVH-leaf order: spatially tight chunks for
        # the packet-culling AABB test; pack once, share across builders
        prim_soa=build_prim_soa(
            geom_host, order=bvh_host["prim_order"], packed=packed
        ),
        shade_pack=jnp.asarray(shade),
        mat_pack=jnp.asarray(mat_pack),
        emissive_pack=jnp.asarray(epack),
        hier_soa=(
            build_hier_soa(geom_host, bvh_host["prim_order"], packed=packed)
            if num_prims >= HIER_BUILD_MIN
            else None
        ),
    )
