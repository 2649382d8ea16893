"""Sources & sinks: TREC topics/qrels/run files, corpus synthesis."""
