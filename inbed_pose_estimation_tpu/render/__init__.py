from .renderer import Renderer
from .part_renderer import PartRenderer, vertex_part_labels
from .debug import Debugger

__all__ = ["Renderer", "PartRenderer", "vertex_part_labels", "Debugger"]
