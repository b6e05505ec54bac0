from .robots import Robots
from .coordinator import CrawlCoordinator, Job, UrlToInsert
from .router import Router
from .worker import WorkerThread, JobExecutor
from .planner import make_crawl_plan
