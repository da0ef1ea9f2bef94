from .crawl import CrawlConfig, run_crawl, run_round  # noqa: F401
