"""Stream sources and binary decode helpers — reference kafka.go/proto.go.

``kafka``: the Kafka readStream builder (D1/D2), Confluent prefix strip
(D4), event-time enrichment (D5), and protobuf/JSON decode (D7/D8).
``mock``: rate-source mock generators (D3, MockKafka analog).
"""
