import os
import textwrap

import numpy as np
import pytest

from gdpt_tpu.core import image as gimage
from gdpt_tpu.scene import loaders
from gdpt_tpu.scene import model as M
from gdpt_tpu.scene import parser

REF = "/root/reference/scenes"
HAS_REF = os.path.isdir(REF)


def _write_scene(tmp_path, body):
    p = tmp_path / "scene.xml"
    p.write_text(
        '<?xml version="1.0"?>\n<scene version="0.5.0">\n' + textwrap.dedent(body) + "\n</scene>"
    )
    return str(p)


def test_minimal_scene_with_defaults(tmp_path):
    path = _write_scene(
        tmp_path,
        """
        <default name="res" value="32"/>
        <default name="depth" value="3"/>
        <integrator type="path">
            <integer name="maxDepth" value="$depth"/>
        </integrator>
        <sensor type="perspective">
            <float name="fov" value="45"/>
            <transform name="toWorld">
                <lookAt origin="0, 0, -3" target="0, 0, 0" up="0, 1, 0"/>
            </transform>
            <sampler type="independent">
                <integer name="sampleCount" value="7"/>
            </sampler>
            <film type="hdrfilm">
                <integer name="width" value="$res"/>
                <integer name="height" value="$res"/>
                <rfilter type="tent"/>
            </film>
        </sensor>
        <bsdf type="twosided" id="white">
            <bsdf type="diffuse">
                <rgb name="reflectance" value="0.7 0.6 0.5"/>
            </bsdf>
        </bsdf>
        <shape type="sphere">
            <point name="center" x="0" y="0" z="0"/>
            <float name="radius" value="1"/>
            <ref id="white"/>
            <emitter type="area">
                <rgb name="radiance" value="2 3 4"/>
            </emitter>
        </shape>
        <shape type="rectangle">
            <transform name="toWorld">
                <scale value="5"/>
                <translate z="3"/>
            </transform>
            <ref id="white"/>
        </shape>
        """,
    )
    scene, out = parser.parse_scene(path)
    s = scene.static
    assert s.width == 32 and s.height == 32
    assert s.options.max_depth == 3
    assert s.options.samples_per_pixel == 7
    assert s.n_spheres == 1 and s.n_tris == 2
    assert s.n_lights == 1
    from gdpt_tpu.scene.filters import FILTER_TENT

    assert s.filter_kind == FILTER_TENT


def test_spectrum_literal_parsing(tmp_path):
    path = _write_scene(
        tmp_path,
        """
        <integrator type="direct"/>
        <sensor type="perspective">
            <float name="fov" value="45"/>
            <film type="hdrfilm">
                <integer name="width" value="8"/>
                <integer name="height" value="8"/>
            </film>
        </sensor>
        <bsdf type="diffuse" id="m">
            <spectrum name="reflectance" value="400:0.5, 700:0.5"/>
        </bsdf>
        <shape type="sphere">
            <ref id="m"/>
        </shape>
        """,
    )
    scene, _ = parser.parse_scene(path)
    # direct integrator = path with max_depth 2 (reference: parse_scene.cpp:585-587)
    assert scene.static.options.max_depth == 2
    refl = np.asarray(scene.device.materials.refl.value[0])
    assert (refl > 0.2).all() and (refl < 0.8).all()


def test_cstyle_float_prefix(tmp_path):
    path = _write_scene(
        tmp_path,
        """
        <integrator type="path"/>
        <sensor type="perspective">
            <float name="fov" value="45"/>
            <film type="hdrfilm"><integer name="width" value="8"/><integer name="height" value="8"/></film>
        </sensor>
        <shape type="sphere">
            <float name="radius" value="1e2+5"/>
            <bsdf type="diffuse"/>
        </shape>
        """,
    )
    scene, _ = parser.parse_scene(path)
    assert float(scene.device.geom.sph_radius[0]) == 100.0


@pytest.mark.skipif(not HAS_REF, reason="reference scenes not mounted")
def test_parses_all_reference_scenes():
    ok = []
    scene_files = [
        "cbox/cbox_old.xml", "cbox/cbox_gdpt.xml", "veach_mi/mi.xml",
        "disney_bsdf_test/simple_sphere.xml", "disney_bsdf_test/disney_bsdf.xml",
        "pixel_filter_test/pixel_filter_test.xml", "matpreview/matpreview.xml",
    ] + [f"volpath_test/volpath_test{i}.xml" for i in range(1, 7)]
    for f in scene_files:
        scene, _ = parser.parse_scene(os.path.join(REF, f))
        ok.append(f)
    assert len(ok) == len(scene_files)


@pytest.mark.skipif(not HAS_REF, reason="reference scenes not mounted")
def test_piz_envmap_decodes():
    img = gimage.read_exr(os.path.join(REF, "matpreview/envmap.exr"))
    assert img.shape[2] == 3
    assert np.isfinite(img).all()
    assert 0 < img.mean() < 10
    # HDR content: highlights well above 1.
    assert img.max() > 5


@pytest.mark.skipif(not HAS_REF, reason="reference scenes not mounted")
def test_obj_loader_cbox_floor():
    p, i, n, uv = loaders.load_obj(os.path.join(REF, "cbox/meshes/cbox_floor.obj"))
    assert len(i) >= 2
    assert np.isfinite(p).all()
    # Floor lies in the y=0 plane.
    assert np.abs(p[:, 1]).max() < 1e-3


@pytest.mark.skipif(not HAS_REF, reason="reference scenes not mounted")
def test_serialized_loader():
    p, i, n, uv = loaders.load_serialized(
        os.path.join(REF, "matpreview/matpreview.serialized"), 1
    )
    assert len(p) > 1000 and len(i) > 1000
    assert np.isfinite(p).all()
    assert int(i.max()) < len(p)


def test_obj_negative_indices_and_polygons(tmp_path):
    f = tmp_path / "quad.obj"
    f.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\nf -4 -3 -2 -1\n"
    )
    p, i, n, uv = loaders.load_obj(str(f))
    assert len(p) == 4
    assert len(i) == 2  # fan triangulation


def test_vol_loader_roundtrip(tmp_path):
    import struct

    data = np.random.rand(4, 3, 2, 1).astype("<f4")  # (z, y, x, c)
    f = tmp_path / "t.vol"
    with open(f, "wb") as fh:
        fh.write(b"VOL")
        fh.write(bytes([3]))
        fh.write(struct.pack("<5i", 1, 2, 3, 4, 1))  # type, x, y, z, c
        fh.write(struct.pack("<6f", 0, 0, 0, 1, 1, 1))
        fh.write(data.tobytes())
    loaded, p_min, p_max = loaders.load_vol(str(f))
    np.testing.assert_array_equal(loaded, data)
    np.testing.assert_array_equal(p_max, [1, 1, 1])
