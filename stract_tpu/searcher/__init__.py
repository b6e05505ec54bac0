from .query import SearchQuery
from .local import LocalSearcher
