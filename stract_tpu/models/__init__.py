from .bert import BertConfig, BertEncoder, BertForEmbedding, BertForSequenceScore
from .dual_encoder import DualEncoder
