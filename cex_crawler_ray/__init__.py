"""cex_crawler_ray — a Ray-Data-native crawl + data-processing engine.

Brand-new engine with the query/data-processing capabilities of the
reference crawler (r-hou/cex_crawler, see SURVEY.md), re-expressed as
streaming ``ray.data.Dataset`` pipelines: zero-copy Arrow
``map_batches`` stages, actor pools for stateful state (URL-seen
filter, politeness), ``groupby``/``sort`` shuffles for the wide steps.
"""
