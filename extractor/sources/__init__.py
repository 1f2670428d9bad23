"""Source-format readers: ingestion from crawl-native file formats
into the pages/documents tables the engine operates on."""
