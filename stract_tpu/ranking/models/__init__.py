from .cross_encoder import CrossEncoderModel
from .lambdamart import LambdaMART
from .linear import LinearRegression
