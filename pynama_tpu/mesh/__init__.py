from pynama_tpu.mesh.box import BoxMesh
