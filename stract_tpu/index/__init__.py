from .segment import Segment, SegmentBuilder
from .inverted import InvertedIndex
