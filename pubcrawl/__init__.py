"""pubcrawl — a Ray-Data-native publication/web crawl and data-processing engine.

Built from scratch against the behavioral spec of SingularGuyLeBorn/PubCrawler
(see SURVEY.md); the execution model is idiomatic Ray Data:
``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
batches, actor pools for stateful stages (fetch sessions, URL-seen shards,
politeness token buckets), and explicit groupby/sort shuffles for the wide
steps.

Nothing here calls ``ray.init()``/``ray.shutdown()`` — sessions are owned by
the caller (bench.py, CLI scripts, the test fixture, or the grading driver).
"""

__version__ = "0.1.0"
