from .model import GraphPredictor, GraphPredictorConfig, CostMLP
