from .config import GraphDiTConfig, DataInfo
from .api import GraphDiT
