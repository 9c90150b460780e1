from pynama_tpu.mesh.box import BoxMesh
from pynama_tpu.mesh.unstructured import UnstructuredMesh
from pynama_tpu.mesh.unstructured3d import HexMesh
from pynama_tpu.mesh.gmsh import read_msh


def mesh_from_gmsh(path: str, ngl: int):
    """Load a gmsh file into the right mesh type (2D quads or 3D hexes)."""
    data = read_msh(path)
    if data.is_3d:
        return HexMesh.create(ngl, data.vertices, data.hexes, data.surfaces)
    return UnstructuredMesh.create(ngl, data.vertices, data.quads,
                                   data.lines)
