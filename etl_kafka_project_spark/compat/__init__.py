"""Reference-compatibility pipelines: the movie two-source merge of
``ShalevS343/etl-kafka-project`` re-expressed on the generic CDC engine."""
