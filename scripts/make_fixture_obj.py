"""Generate the checked-in multi-material OBJ/MTL fixture
(assets/lanternhouse.obj/.mtl): a small "lantern house" that exercises
every mesh-pipeline feature end-to-end in one asset —

* body: UV-sphere with vertex normals + texture coords, lambertian with
  map_Kd (earthmap.jpg) -> image-texture lookup through MTL
* roof: cone, specular-dominant -> metal via the Ns->roughness heuristic
  (mtlLoader.go:264-298)
* core: emissive box (Ke > 0.1) -> diffuseLight + LIGHT EXTRACTION
  (objLoader.go:492-510)
* window: thin dielectric panes (d < 0.95, Ni 1.5) -> dielectric; also
  extracted as lights under find_windows

Deterministic output; re-run to regenerate. ~2.4k triangles.
"""

import os

import numpy as np

OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "assets")


def main():
    verts, norms, uvs, faces = [], [], [], []

    def add_v(p, n=None, uv=None):
        verts.append(p)
        if n is not None:
            norms.append(n)
        if uv is not None:
            uvs.append(uv)
        return len(verts)

    # --- body: TRUNCATED UV sphere (open top, lat rows 6..24) with
    # vn + vt; the opening under the floating roof lets the emissive
    # core light the scene -------------------------------------------
    n_lat, n_lon = 24, 48
    lat0 = 6
    body_idx = {}
    for la in range(lat0, n_lat + 1):
        th = np.pi * la / n_lat
        for lo in range(n_lon + 1):
            ph = 2 * np.pi * lo / n_lon
            p = (np.sin(th) * np.cos(ph), np.cos(th), np.sin(th) * np.sin(ph))
            body_idx[(la, lo)] = add_v(p, n=p, uv=(lo / n_lon, 1 - la / n_lat))
    body_faces = []
    for la in range(lat0, n_lat):
        for lo in range(n_lon):
            a = body_idx[(la, lo)]
            b = body_idx[(la + 1, lo)]
            c = body_idx[(la + 1, lo + 1)]
            d = body_idx[(la, lo + 1)]
            body_faces.append((a, b, d))
            if la < n_lat - 1:
                body_faces.append((b, c, d))

    # --- roof: cone above the sphere (no vn/vt -> geometric normals) --
    roof_faces = []
    apex = add_v((0.0, 2.2, 0.0))
    ring = []
    for lo in range(n_lon):
        ph = 2 * np.pi * lo / n_lon
        ring.append(add_v((1.1 * np.cos(ph), 1.05, 1.1 * np.sin(ph))))
    for lo in range(n_lon):
        roof_faces.append((ring[lo], apex, ring[(lo + 1) % n_lon]))

    # --- core: emissive box inside the sphere -------------------------
    core_faces = []
    s = 0.45
    corners = [add_v((x, y + 0.55, z))
               for x in (-s, s) for y in (-s, s) for z in (-s, s)]

    def quad(a, b, c, d):
        core_faces.append((a, b, c))
        core_faces.append((a, c, d))

    c0, c1, c2, c3, c4, c5, c6, c7 = corners
    quad(c0, c1, c3, c2)   # x = -s
    quad(c4, c6, c7, c5)   # x = +s
    quad(c0, c4, c5, c1)   # y = -s
    quad(c2, c3, c7, c6)   # y = +s
    quad(c0, c2, c6, c4)   # z = -s
    quad(c1, c5, c7, c3)   # z = +s

    # --- windows: four thin dielectric quads around the equator -------
    win_faces = []
    for k in range(4):
        ph = np.pi / 4 + k * np.pi / 2
        cx, cz = 1.02 * np.cos(ph), 1.02 * np.sin(ph)
        tx, tz = -np.sin(ph), np.cos(ph)
        w, h = 0.3, 0.4
        a = add_v((cx - w * tx, -h, cz - w * tz))
        b = add_v((cx + w * tx, -h, cz + w * tz))
        c = add_v((cx + w * tx, h, cz + w * tz))
        d = add_v((cx - w * tx, h, cz - w * tz))
        win_faces.append((a, b, c))
        win_faces.append((a, c, d))

    with open(os.path.join(OUT_DIR, "lanternhouse.mtl"), "w") as fh:
        fh.write("""# lantern house fixture materials (exercises all
# branches of the conversion heuristic, mtlLoader.go:233-326)
newmtl body
Kd 0.9 0.9 0.9
Ks 0.0 0.0 0.0
map_Kd earthmap.jpg

newmtl roof
Kd 0.1 0.1 0.1
Ks 0.8 0.75 0.7
Ns 600

newmtl core
Kd 0.2 0.2 0.2
Ke 14.0 12.5 9.5

newmtl window
Kd 0.9 0.9 0.9
d 0.1
Ni 1.5
""")

    with open(os.path.join(OUT_DIR, "lanternhouse.obj"), "w") as fh:
        fh.write("# lantern house: multi-material mesh fixture\n")
        fh.write("mtllib lanternhouse.mtl\n")
        for p in verts:
            fh.write(f"v {p[0]:.6f} {p[1]:.6f} {p[2]:.6f}\n")
        for t in uvs:
            fh.write(f"vt {t[0]:.6f} {t[1]:.6f}\n")
        for nn in norms:
            fh.write(f"vn {nn[0]:.6f} {nn[1]:.6f} {nn[2]:.6f}\n")
        fh.write("usemtl body\n")
        for (a, b, c) in body_faces:
            fh.write(f"f {a}/{a}/{a} {b}/{b}/{b} {c}/{c}/{c}\n")
        fh.write("usemtl roof\n")
        for (a, b, c) in roof_faces:
            fh.write(f"f {a} {b} {c}\n")
        fh.write("usemtl core\n")
        for (a, b, c) in core_faces:
            fh.write(f"f {a} {b} {c}\n")
        fh.write("usemtl window\n")
        for (a, b, c) in win_faces:
            fh.write(f"f {a} {b} {c}\n")
    n_tris = len(body_faces) + len(roof_faces) + len(core_faces) + len(win_faces)
    print(f"wrote assets/lanternhouse.obj ({n_tris} tris, "
          f"{len(verts)} verts) + .mtl")


if __name__ == "__main__":
    main()
