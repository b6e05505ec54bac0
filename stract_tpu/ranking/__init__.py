from .signals import Signal, SIGNALS, signal, NUM_SIGNALS, CORE_SIGNALS
from . import bm25_math
