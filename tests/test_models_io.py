"""Model import tests (reference WavefrontObjectFormatReader /
PolygonFileFormatReader / MaterialLibrary behavior)."""

import zipfile

import numpy as np

from echorenderer_tpu.io.models import load_model, parse_mtl

OBJ_TEXT = """
# simple quad + tri with separate vt/vn indexing
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 2 0 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl glow
f 2/2/1 5/1/1 3/3/1
"""

MTL_TEXT = """
newmtl red
Kd 0.8 0.1 0.1
Ns 250
newmtl glow
Kd 1 1 1
Ke 5 4 3
"""


def _write_obj(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ_TEXT)
    (tmp_path / "test.mtl").write_text(MTL_TEXT)
    return tmp_path / "test.obj"


class TestObj:
    def test_quad_triangulation_and_indexing(self, tmp_path):
        m = load_model(_write_obj(tmp_path))
        assert m.faces.shape == (3, 3)  # quad -> 2 tris, tri -> 1
        assert m.vertices.shape[0] == 5  # 5 unique (v, vt, vn) corners
        assert m.uvs is not None and m.normals is not None
        np.testing.assert_allclose(m.normals[0], [0, 0, 1])

    def test_materials_parsed_and_assigned(self, tmp_path):
        from echorenderer_tpu.scene.materials import Diffuse, Emissive

        m = load_model(_write_obj(tmp_path))
        assert m.material_names == ["red", "glow"]
        assert isinstance(m.materials[0], Diffuse)
        assert isinstance(m.materials[1], Emissive)
        np.testing.assert_array_equal(m.face_materials, [0, 0, 1])

    def test_negative_indices(self, tmp_path):
        obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
        p = tmp_path / "neg.obj"
        p.write_text(obj)
        m = load_model(p)
        assert m.faces.shape == (1, 3)
        np.testing.assert_allclose(m.vertices[m.faces[0]][1], [1, 0, 0])

    def test_zip_container(self, tmp_path):
        _write_obj(tmp_path)
        zp = tmp_path / "model.zip"
        with zipfile.ZipFile(zp, "w") as z:
            z.write(tmp_path / "test.obj", "test.obj")
        m = load_model(zp, load_materials=False)
        assert m.faces.shape == (3, 3)

    def test_mtl_transparent_and_metal(self, tmp_path):
        from echorenderer_tpu.scene.materials import Conductor, Dielectric

        text = (
            "newmtl glass\nKd 1 1 1\nd 0.2\nNi 1.45\n"
            "newmtl steel\nKd 0.05 0.05 0.05\nKs 0.9 0.9 0.9\nNs 600\n"
        )
        lib = parse_mtl(text, tmp_path)
        assert isinstance(lib["glass"], Dielectric)
        assert lib["glass"].refractive_index == 1.45
        assert isinstance(lib["steel"], Conductor)


def _ply_ascii() -> str:
    return (
        "ply\nformat ascii 1.0\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property float nx\nproperty float ny\nproperty float nz\n"
        "element face 2\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        "0 0 0 0 0 1\n1 0 0 0 0 1\n1 1 0 0 0 1\n0 1 0 0 0 1\n"
        "3 0 1 2\n4 0 1 2 3\n"
    )


class TestPly:
    def test_ascii(self, tmp_path):
        p = tmp_path / "t.ply"
        p.write_text(_ply_ascii())
        m = load_model(p)
        assert m.vertices.shape == (4, 3)
        assert m.faces.shape == (3, 3)  # 1 + quad->2
        np.testing.assert_allclose(m.normals[2], [0, 0, 1])

    def test_binary_little_endian(self, tmp_path):
        verts = np.asarray(
            [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
        )
        header = (
            "ply\nformat binary_little_endian 1.0\n"
            "element vertex 4\n"
            "property float x\nproperty float y\nproperty float z\n"
            "element face 2\n"
            "property list uchar int vertex_indices\n"
            "end_header\n"
        ).encode()
        body = bytearray(verts.astype("<f4").tobytes())
        for ids in ([0, 1, 2], [0, 2, 3]):
            body += bytes([3]) + np.asarray(ids, "<i4").tobytes()
        p = tmp_path / "b.ply"
        p.write_bytes(header + bytes(body))
        m = load_model(p)
        np.testing.assert_allclose(m.vertices, verts)
        np.testing.assert_array_equal(m.faces, [[0, 1, 2], [0, 2, 3]])


class TestMeshScene:
    def test_mesh_entity_per_face_materials(self, tmp_path):
        """A multi-material OBJ flows through prepare_scene: the emissive
        faces register in the light census."""
        from echorenderer_tpu.io.models import load_model
        from echorenderer_tpu.scene import MeshEntity, PerspectiveCamera, Scene
        from echorenderer_tpu.scene.prepare import prepare_scene

        m = load_model(_write_obj(tmp_path))
        scene = Scene()
        scene.add(MeshEntity(source=m))
        scene.add(PerspectiveCamera(position=(0, 0, -3)))
        prepared = prepare_scene(scene)
        assert prepared.geometry.num_triangles == 3
        # the glow face became an emissive light record
        assert int(prepared.lights.emissive_prim.shape[0]) == 1
        mats = np.asarray(prepared.geometry.tri_mat)
        assert len(set(mats.tolist())) == 2  # red + glow interned separately
