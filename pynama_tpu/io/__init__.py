from pynama_tpu.io.viewer import Paraviewer
from pynama_tpu.io.xdmf import XdmfWriter
from pynama_tpu.io.checkpoint import save_checkpoint, load_checkpoint

__all__ = ["Paraviewer", "XdmfWriter", "save_checkpoint", "load_checkpoint"]
