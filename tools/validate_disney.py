"""External validation of the Disney BSDF stack vs /root/reference/extra_images.

The reference ships 30+ parameter-sweep artifacts rendered by editing the
scenes in scenes/disney_bsdf_test/ (the edits survive as commented-out
material blocks in the XMLs, e.g. simple_sphere.xml's disneymetal block).
Each config below re-creates one artifact's scene: take the committed XML,
swap/patch the first shape's BSDF, render at the artifact's spp, compare.

Artifact -> parameter mapping is reconstructed from the file names, the
commented-out blocks, and the scene defaults; rows whose mapping could
not be pinned down (`disney_sheen_sphere*`, the `_top_light` subsurface
variants with an unknown light move) are intentionally skipped and noted.

Extends VALIDATION.json/md in place (keys prefixed disney_ / sphere_).
"""

import json
import os
import sys
import time
import xml.etree.ElementTree as ET

_REF_ROOT = os.environ.get("GDPT_REFERENCE", "/root/reference")
_SCENE_ROOT = os.environ.get("GDPT_SCENES", _REF_ROOT + "/scenes")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_tpu_cache")

import numpy as np

# The environment's TPU plugin force-prepends its platform at jax
# import, so JAX_PLATFORMS=cpu alone HANGS when the tunnel is down;
# honor the env var programmatically (the only override that works).
if os.environ.get("JAX_PLATFORMS", "") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT_JSON = os.path.join(ROOT, "VALIDATION.json")
OUT_MD = os.path.join(ROOT, "VALIDATION.md")
D = _SCENE_ROOT + "/disney_bsdf_test"
X = _REF_ROOT + "/extra_images"


def _bsdf(kind, **params):
    """(bsdf_type, {param: value}) — value "r g b" strings become <rgb>."""
    return kind, params


# (key, artifact, scene xml, bsdf spec or None for committed, spp)
CONFIGS = [
    # -- matpreview scenes (683x512); sweep parameter from the filename --
    ("disney_glass_eta_1.2", "disney_glass_eta_1.2.exr", "disney_glass.xml",
     _bsdf("disneyglass", baseColor="0.82 0.67 0.16", roughness="0.1",
           anisotropic="0.8", eta="1.2")),
    ("disney_glass_eta_1.5", "disney_glass_eta_1.5.exr", "disney_glass.xml",
     None),
    ("disney_glass_eta_2.0", "disney_glass_eta_2.0.exr", "disney_glass.xml",
     _bsdf("disneyglass", baseColor="0.82 0.67 0.16", roughness="0.1",
           anisotropic="0.8", eta="2.0")),
    ("disney_sheen_tint_0.0", "disney_sheen_test_0.0.exr", "disney_sheen.xml",
     _bsdf("disneysheen", baseColor="0.82 0.67 0.16", sheenTint="0.0")),
    ("disney_sheen_tint_0.5", "disney_sheen_test_0.5.exr", "disney_sheen.xml",
     _bsdf("disneysheen", baseColor="0.82 0.67 0.16", sheenTint="0.5")),
    ("disney_sheen_tint_1.0", "disney_sheen_test_1.0.exr", "disney_sheen.xml",
     None),
    ("disney_diffuse_base", "disney_base_diffuse.exr", "disney_diffuse.xml",
     _bsdf("disneydiffuse", baseColor="0.82 0.67 0.16", roughness="1.0",
           subsurface="0.0")),
    ("disney_diffuse_subsurface", "disney_subsurface_diffuse.exr",
     "disney_diffuse.xml",
     _bsdf("disneydiffuse", baseColor="0.82 0.67 0.16", roughness="1.0",
           subsurface="1.0")),
    ("disney_lambertian", "lambertian.exr", "disney_diffuse.xml",
     _bsdf("diffuse", reflectance="0.82 0.67 0.16")),
    ("disney_rough_0.01", "disney_sphere_test_rough_0.01.exr",
     "disney_diffuse.xml",
     _bsdf("disneydiffuse", baseColor="0.82 0.67 0.16", roughness="0.01",
           subsurface="0.5")),
    ("disney_rough_0.5", "disney_sphere_test_rough_0.5.exr",
     "disney_diffuse.xml",
     _bsdf("disneydiffuse", baseColor="0.82 0.67 0.16", roughness="0.5",
           subsurface="0.5")),
    ("disney_rough_1.0", "disney_sphere_test_rough_1.0.exr",
     "disney_diffuse.xml",
     _bsdf("disneydiffuse", baseColor="0.82 0.67 0.16", roughness="1.0",
           subsurface="0.5")),
    # NOTE: the simple_sphere_*.exr artifacts (lambertian, base_diffuse,
    # subsurface, rough_plastic, clearcoat, metal sweep) are NOT
    # reproducible from the committed tree and are intentionally skipped.
    # Measured 2026-08-18 (TPU): with the committed in-frame light
    # (center (0,1,-1), radiance 5000, simple_sphere.xml:44-51) our
    # lambertian render's mean is 282x the artifact's; with the
    # commented-out alternative center (10,0,0) it is 0.62x — the
    # artifacts were rendered with a third, unrecorded light setup, and
    # the per-artifact ref means (0.13 diffuse vs 2.54 metal) are
    # mutually inconsistent under any single placement. Those BSDFs are
    # instead covered by the internal Jacobian-consistency and golden
    # tests (tests/test_materials.py, tests/test_goldens.py).
]


def patch_scene(xml_path, bsdf_spec, out_path, light_center=None):
    """Write a copy of xml_path with the first shape's BSDF replaced and
    every relative filename absolutized (the copy lives in /tmp).
    light_center ("x y z"): move the emitter sphere's center — the
    committed simple_sphere.xml has the radiance-5000 light IN FRAME at
    (0,1,-1), but every simple_sphere_* artifact has mean ~0.1-2.5, which
    only matches the commented-out alternative center (10,0,0)
    (simple_sphere.xml:45) that parks the light off-screen."""
    base = os.path.dirname(os.path.abspath(xml_path))
    tree = ET.parse(xml_path)
    root = tree.getroot()
    for s in root.iter("string"):
        if s.get("name") == "filename":
            v = s.get("value")
            if not os.path.isabs(v):
                s.set("value", os.path.normpath(os.path.join(base, v)))
    # light_center is currently unused (all sphere_* configs were
    # dropped from CONFIGS after the artifact mismatch triage) but kept
    # for future reinstatement; guard the <point> lookup so a caller on
    # an emitter without one doesn't crash.
    if light_center is not None:
        cx, cy, cz = light_center.split()
        for shape in root.findall("shape"):
            if shape.find("emitter") is not None:
                pt = shape.find("point")
                if pt is not None:
                    pt.set("x", cx), pt.set("y", cy), pt.set("z", cz)
    if bsdf_spec is not None:
        kind, params = bsdf_spec
        shape = root.find("shape")
        bsdf = shape.find("bsdf")
        bsdf.clear()
        bsdf.set("type", kind)
        for name, val in params.items():
            tag = "rgb" if " " in val else "float"
            el = ET.SubElement(bsdf, tag)
            el.set("name", name)
            el.set("value", val)
    tree.write(out_path)


def metrics(ours, ref):
    rmse = float(np.sqrt(np.mean((ours - ref) ** 2)))
    return {
        "rmse": round(rmse, 5),
        "mean_ours": round(float(ours.mean()), 5),
        "mean_ref": round(float(ref.mean()), 5),
        "mean_ratio": round(float(ours.mean() / max(ref.mean(), 1e-9)), 4),
    }


def main():
    from gdpt_tpu.core.image import imread
    from gdpt_tpu.integrators import render as R
    from gdpt_tpu.scene import parser

    only = sys.argv[1:] or None
    results = {}
    t_all = time.time()
    for key, artifact, scene_file, bsdf_spec in CONFIGS:
        if only and not any(o in key for o in only):
            continue
        ref = imread(f"{X}/{artifact}")
        tmp = f"/tmp/val_{key}.xml"
        patch_scene(f"{D}/{scene_file}", bsdf_spec, tmp,
                    light_center="10 0 0" if key.startswith("sphere_")
                    else None)
        scene, _ = parser.parse_scene(tmp)
        spp = 64 if scene.static.width > 512 else None  # matpreview: cap cost
        t0 = time.time()
        img = np.asarray(R.render(scene, spp=spp, seed=5))
        m = metrics(img, ref)
        m["spp"] = spp or scene.static.options.samples_per_pixel
        results[key] = m
        print(f"{key}: {time.time()-t0:.1f}s ratio {m['mean_ratio']}"
              f" rmse {m['rmse']}", flush=True)

    # merge into VALIDATION.json + append a table to VALIDATION.md
    try:
        with open(OUT_JSON) as f:
            full = json.load(f)
    except FileNotFoundError:
        full = {}
    full.update(results)
    full["_disney_wall_s"] = round(time.time() - t_all, 1)
    with open(OUT_JSON, "w") as f:
        json.dump(full, f, indent=1)

    lines = ["\n## Disney BSDF stack vs extra_images/ artifacts\n",
             "Scene configs reconstructed from the artifact names and the",
             "commented-out material blocks in scenes/disney_bsdf_test/*.xml",
             "(tools/validate_disney.py CONFIGS). Skipped as unmappable:",
             "disney_sheen_sphere*.exr (means 5000/12.9/0.0 — broken or",
             "pre-fix experiments), *_top_light subsurface variants (light",
             "position not recorded anywhere in the tree), and ALL",
             "simple_sphere_* artifacts — neither the committed in-frame",
             "light (our mean 282x ref) nor the commented-out (10,0,0)",
             "placement (0.62x) reproduces them, and the artifacts'",
             "own means are mutually inconsistent under any single",
             "light setup (see CONFIGS note).\n",
             "| config | spp | rmse | mean ours | mean ref | ratio |",
             "|---|---|---|---|---|---|"]
    for k, m in results.items():
        lines.append(f"| {k} | {m['spp']} | {m['rmse']} | {m['mean_ours']}"
                     f" | {m['mean_ref']} | {m['mean_ratio']} |")
    with open(OUT_MD, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    main()
