from pynama_tpu.bc.conditions import BoundaryConditions, SideBC
