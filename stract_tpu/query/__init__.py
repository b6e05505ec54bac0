from .parser import parse_terms, Term, TermKind, MAX_TERMS_PER_QUERY
from .query import Query
