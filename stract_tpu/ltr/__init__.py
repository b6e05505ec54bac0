from .eval import ndcg_at_k, recall_at_k, evaluate_ranking
from .training_data import TrainingExample, build_training_matrix
