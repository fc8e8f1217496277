"""Source connectors: raw crawl formats → the pages table shape."""
