from pynama_tpu.mesh.box import BoxMesh
from pynama_tpu.mesh.unstructured import UnstructuredMesh
from pynama_tpu.mesh.gmsh import read_msh
