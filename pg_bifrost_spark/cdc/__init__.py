"""CDC layer: parse PostgreSQL ``test_decoding`` output and replicate
the pg-bifrost dataflow (filter → partition → marshal → sink) as one
declarative DataFrame graph.
"""
