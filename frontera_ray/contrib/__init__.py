"""Adapters connecting the Ray-Data crawl engine to external fetchers
(reference shape: frontera/contrib/ — requests/scrapy managers)."""
