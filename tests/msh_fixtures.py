"""Generate gmsh .msh fixtures (MSH 2.2 and 4.1 ASCII) for the tests.

The reference ships a 44-node quad fixture (`src/tests/test.msh`); here the
fixtures are generated: a structured (nx x ny) grid of quads over
[0,1]^2 with optionally perturbed interior vertices, boundary lines grouped
into the physical names down/right/up/left.
"""
import numpy as np


def grid_quad_mesh(nx, ny, distort=0.0, seed=0):
    """-> (vertices (V,2), quads (C,4) CCW, lines {name: (B,2)})"""
    xs = np.linspace(0, 1, nx + 1)
    ys = np.linspace(0, 1, ny + 1)
    X, Y = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel()], axis=1)
    if distort:
        rng = np.random.default_rng(seed)
        hx, hy = 1.0 / nx, 1.0 / ny
        interior = ((verts[:, 0] > 0) & (verts[:, 0] < 1)
                    & (verts[:, 1] > 0) & (verts[:, 1] < 1))
        verts[interior] += (rng.uniform(-1, 1, (interior.sum(), 2))
                            * distort * np.array([hx, hy]))

    def vid(i, j):
        return i * (ny + 1) + j

    quads = []
    for i in range(nx):
        for j in range(ny):
            quads.append([vid(i, j), vid(i + 1, j),
                          vid(i + 1, j + 1), vid(i, j + 1)])   # CCW
    lines = {
        "down": [[vid(i, 0), vid(i + 1, 0)] for i in range(nx)],
        "up": [[vid(i, ny), vid(i + 1, ny)] for i in range(nx)],
        "left": [[vid(0, j), vid(0, j + 1)] for j in range(ny)],
        "right": [[vid(nx, j), vid(nx, j + 1)] for j in range(ny)],
    }
    return (verts, np.asarray(quads, dtype=np.int32),
            {k: np.asarray(v, dtype=np.int32) for k, v in lines.items()})


_PHYS = ["down", "right", "up", "left"]    # physical tags 1..4, surface 5


def write_msh22(path, verts, quads, lines):
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write("$PhysicalNames\n%d\n" % (len(_PHYS) + 1))
        for t, name in enumerate(_PHYS, start=1):
            f.write(f'1 {t} "{name}"\n')
        f.write(f'2 5 "fluid"\n$EndPhysicalNames\n')
        f.write("$Nodes\n%d\n" % len(verts))
        for k, (x, y) in enumerate(verts, start=1):
            f.write(f"{k} {x:.16g} {y:.16g} 0\n")
        f.write("$EndNodes\n")
        nelem = sum(len(v) for v in lines.values()) + len(quads)
        f.write("$Elements\n%d\n" % nelem)
        eid = 1
        for t, name in enumerate(_PHYS, start=1):
            for (u, v) in lines.get(name, []):
                f.write(f"{eid} 1 2 {t} {t} {u + 1} {v + 1}\n")
                eid += 1
        for q in quads:
            f.write(f"{eid} 3 2 5 1 " + " ".join(str(c + 1) for c in q)
                    + "\n")
            eid += 1
        f.write("$EndElements\n")


def write_msh41(path, verts, quads, lines):
    """Minimal MSH 4.1: one curve entity per physical side, one surface."""
    ncurves = len(_PHYS)
    with open(path, "w") as f:
        f.write("$MeshFormat\n4.1 0 8\n$EndMeshFormat\n")
        f.write("$PhysicalNames\n%d\n" % (ncurves + 1))
        for t, name in enumerate(_PHYS, start=1):
            f.write(f'1 {t} "{name}"\n')
        f.write('2 5 "fluid"\n$EndPhysicalNames\n')
        # Entities: 0 points, ncurves curves, 1 surface, 0 volumes
        f.write("$Entities\n0 %d 1 0\n" % ncurves)
        for t in range(1, ncurves + 1):
            # tag minx miny minz maxx maxy maxz numPhys phys... numBnd bnd...
            f.write(f"{t} 0 0 0 1 1 0 1 {t} 0\n")
        f.write("1 0 0 0 1 1 0 1 5 0\n")
        f.write("$EndEntities\n")
        # Nodes: one block per curve entity is overkill — put all nodes in
        # the surface block (gmsh allows any entity/node association)
        V = len(verts)
        f.write(f"$Nodes\n1 {V} 1 {V}\n")
        f.write(f"2 1 0 {V}\n")
        for k in range(1, V + 1):
            f.write(f"{k}\n")
        for (x, y) in verts:
            f.write(f"{x:.16g} {y:.16g} 0\n")
        f.write("$EndNodes\n")
        nelem = sum(len(v) for v in lines.values()) + len(quads)
        nblocks = ncurves + 1
        f.write(f"$Elements\n{nblocks} {nelem} 1 {nelem}\n")
        eid = 1
        for t, name in enumerate(_PHYS, start=1):
            segs = lines.get(name, [])
            f.write(f"1 {t} 1 {len(segs)}\n")
            for (u, v) in segs:
                f.write(f"{eid} {u + 1} {v + 1}\n")
                eid += 1
        f.write(f"2 1 3 {len(quads)}\n")
        for q in quads:
            f.write(f"{eid} " + " ".join(str(c + 1) for c in q) + "\n")
            eid += 1
        f.write("$EndElements\n")


# ----------------------------------------------------------------- 3D hexes
def grid_hex_mesh(nx, ny, nz, distort=0.0, seed=0):
    """-> (vertices (V,3), hexes (C,8) gmsh order, surfaces {name: (B,4)})"""
    xs = [np.linspace(0, 1, n + 1) for n in (nx, ny, nz)]
    X, Y, Z = np.meshgrid(*xs, indexing="ij")
    verts = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
    if distort:
        rng = np.random.default_rng(seed)
        h = np.array([1 / nx, 1 / ny, 1 / nz])
        interior = np.all((verts > 1e-12) & (verts < 1 - 1e-12), axis=1)
        verts[interior] += (rng.uniform(-1, 1, (interior.sum(), 3))
                            * distort * h)

    def vid(i, j, k):
        return (i * (ny + 1) + j) * (nz + 1) + k

    hexes = [[vid(i, j, k), vid(i + 1, j, k), vid(i + 1, j + 1, k),
              vid(i, j + 1, k), vid(i, j, k + 1), vid(i + 1, j, k + 1),
              vid(i + 1, j + 1, k + 1), vid(i, j + 1, k + 1)]
             for i in range(nx) for j in range(ny) for k in range(nz)]
    surf = {
        "left": [[vid(0, j, k), vid(0, j + 1, k), vid(0, j + 1, k + 1),
                  vid(0, j, k + 1)] for j in range(ny) for k in range(nz)],
        "right": [[vid(nx, j, k), vid(nx, j + 1, k), vid(nx, j + 1, k + 1),
                   vid(nx, j, k + 1)] for j in range(ny) for k in range(nz)],
        "down": [[vid(i, 0, k), vid(i + 1, 0, k), vid(i + 1, 0, k + 1),
                  vid(i, 0, k + 1)] for i in range(nx) for k in range(nz)],
        "up": [[vid(i, ny, k), vid(i + 1, ny, k), vid(i + 1, ny, k + 1),
                vid(i, ny, k + 1)] for i in range(nx) for k in range(nz)],
        "back": [[vid(i, j, 0), vid(i + 1, j, 0), vid(i + 1, j + 1, 0),
                  vid(i, j + 1, 0)] for i in range(nx) for j in range(ny)],
        "front": [[vid(i, j, nz), vid(i + 1, j, nz), vid(i + 1, j + 1, nz),
                   vid(i, j + 1, nz)] for i in range(nx) for j in range(ny)],
    }
    return (verts, np.asarray(hexes, np.int32),
            {k: np.asarray(v, np.int32) for k, v in surf.items()})


def write_msh22_3d(path, verts, hexes, surf):
    names = list(surf.keys())
    with open(path, "w") as f:
        f.write("$MeshFormat\n2.2 0 8\n$EndMeshFormat\n")
        f.write("$PhysicalNames\n%d\n" % (len(names) + 1))
        for t, n in enumerate(names, start=1):
            f.write(f'2 {t} "{n}"\n')
        f.write('3 99 "fluid"\n$EndPhysicalNames\n')
        f.write("$Nodes\n%d\n" % len(verts))
        for k, (x, y, z) in enumerate(verts, start=1):
            f.write(f"{k} {x:.16g} {y:.16g} {z:.16g}\n")
        f.write("$EndNodes\n")
        ne = sum(len(v) for v in surf.values()) + len(hexes)
        f.write("$Elements\n%d\n" % ne)
        eid = 1
        for t, n in enumerate(names, start=1):
            for q in surf[n]:
                f.write(f"{eid} 3 2 {t} {t} "
                        + " ".join(str(c + 1) for c in q) + "\n")
                eid += 1
        for h in hexes:
            f.write(f"{eid} 5 2 99 1 "
                    + " ".join(str(c + 1) for c in h) + "\n")
            eid += 1
        f.write("$EndElements\n")
