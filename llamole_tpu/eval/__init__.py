from .workflow import run_molqa, run_eval
from .dataset import MolQADataset
