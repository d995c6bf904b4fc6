"""Asset subsystem tests: mesh parser, HDR loader, cubemap orientation."""

import os

import numpy as np
import pytest

from rustexp_tpu.assets import cubemap, hdr, mesh

MESH_TEXT_9 = """# comment header
# more comments
3
0 0 0 0 0 1 0.5 0.25 0.125
1 0 0 0 0 1 1 1 1
0 1 0 0 0 1 0 0 0
3
0 1 2
"""

MESH_TEXT_XYZRGB = """3
0 0 0 1 0 0
1 0 0 0 1 0
0 1 0 0 0 1
3
0 1 2
"""


def test_parse_mesh_9_component():
    m = mesh.parse_mesh_text(MESH_TEXT_9, mesh.XYZ_N_RGB)
    assert m.num_vertices == 3 and m.num_tris == 1
    assert np.allclose(m.colors[0], [0.5, 0.25, 0.125])
    assert np.allclose(m.normals, [[0, 0, 1]] * 3)


def test_parse_mesh_xyzrgb_derives_face_normals():
    m = mesh.parse_mesh_text(MESH_TEXT_XYZRGB, mesh.XYZ_RGB)
    # CCW triangle in the xy plane -> +z face normal on every vertex
    assert np.allclose(m.normals, [[0, 0, 1]] * 3)
    assert np.allclose(m.colors[1], [0, 1, 0])


def test_parse_mesh_rejects_bad_counts():
    with pytest.raises(ValueError):
        mesh.parse_mesh_text("2\n0 0 0 0 0 1\n0 0 0 0 0 1\n3\n0 1 1\n", mesh.XYZ_N)
    with pytest.raises(ValueError):
        mesh.parse_mesh_text(MESH_TEXT_9.replace("3\n0 1 2", "4\n0 1 2 0"),
                             mesh.XYZ_N_RGB)


def test_normalize_dimensions_unit_cube():
    m = mesh.make_cube()
    nd = m.normalize_dimensions()
    p = np.concatenate([m.positions, np.ones((m.num_vertices, 1), np.float32)], 1)
    q = (p @ nd.T)[:, :3]
    assert q.min() >= -0.5001 and q.max() <= 0.5001
    assert np.allclose((q.min(0) + q.max(0)) / 2, 0, atol=1e-6)


def test_procedural_meshes_valid():
    for maker in (mesh.make_cube, mesh.make_sphere, mesh.make_torus_knot):
        m = maker()
        assert m.tris.min() >= 0 and m.tris.max() < m.num_vertices
        lens = np.linalg.norm(m.normals, axis=1)
        assert np.all(lens > 0.99) and np.all(lens < 1.01)


def test_registry_names_and_cameras():
    assert mesh.NUM_MESHES == 12
    assert mesh.mesh_name(0) == "Killeroo"
    assert mesh.mesh_name(11) == "CornellBox"
    assert mesh.mesh_camera(2) == "pan_front"
    assert cubemap.NUM_CM_SETS == 9
    assert cubemap.cm_set_name(0) == "Grace"
    assert cubemap.cm_set_name(8) == "ColTest"


def test_reference_mesh_loads(reference_root):
    p = os.path.join(reference_root, "meshes", "cube.dat")
    if not os.path.isfile(p):
        pytest.skip("cube.dat missing")
    m = mesh.load_mesh(p, mesh.XYZ_N_RGB)
    assert m.num_tris == 12 and m.num_vertices == 24


def test_hdr_loader(reference_root):
    p = os.path.join(reference_root, "envmaps", "grace", "env_cos_1_x+.hdr")
    if not os.path.isfile(p):
        pytest.skip("grace envmap missing")
    img = hdr.load_hdr(p)
    assert img.shape == (64, 64, 3)
    assert np.all(np.isfinite(img)) and img.min() >= 0.0
    assert img.max() > 0.01  # actually has light in it


def test_cm_set_shapes(reference_root):
    cs = cubemap.get_cm_set(0)
    assert cs.data.shape == (5, 6, 64, 64, 3)
    assert cs.cross.shape == (96, 128)
    # cross pixels on the cross carry alpha 255; corners are off-cross
    assert cs.cross[0, 0] == 0
    assert (cs.cross[40, 60] >> 24) == 0xFF


def test_procedural_cm_set():
    cs = cubemap.make_procedural_set()
    assert cs.data.shape == (5, 6, 64, 64, 3)
    assert np.all(np.isfinite(cs.data)) and cs.data.min() >= 0.0


def test_cm_texel_to_dir_roundtrip():
    # The center texel of each face must point along the face's major axis
    majors = [(0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)]
    for face, (axis, sgn) in enumerate(majors):
        d = cubemap.cm_texel_to_dir(face, 31, 31)
        assert abs(d[axis]) == max(abs(d[0]), abs(d[1]), abs(d[2]))
        assert np.sign(d[axis]) == sgn
