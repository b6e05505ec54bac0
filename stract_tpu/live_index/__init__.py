from .wal import Wal
from .index import LiveIndex
from .crawler import LiveCrawler, SiteChecker
