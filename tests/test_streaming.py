"""End-to-end HTTP serving (reference io/split2/HTTPv2Suite strategy:
start the serving query, POST to it, assert the reply)."""

import json

import pytest
import requests
from pyspark.sql import functions as F

from mmlspark_spark.streaming import (
    make_reply,
    register_serving_source,
    serving_sink,
)
from mmlspark_spark.streaming.serving import (
    start_serving_server,
    stop_server,
)


def test_http_serving_round_trip(spark, tmp_path):
    register_serving_source(spark)
    name = "t_serve"
    port = start_serving_server(name)
    req = (spark.readStream.format("http_serving")
           .option("port", str(port)).load())
    # logic: uppercase the "text" field of the JSON body
    logic = req.select(
        "id",
        make_reply(
            F.upper(F.get_json_object(F.col("body").cast("string"), "$.text"))
        ).alias("reply"),
    )
    query = serving_sink(logic, name, checkpoint=str(tmp_path / "ckpt"))
    try:
        url = f"http://127.0.0.1:{port}/score"
        resp = requests.post(url, json={"text": "hello"}, timeout=30)
        assert resp.status_code == 200
        assert json.loads(resp.content)["value"] == "HELLO"
        # a second request exercises offset advance + trim
        resp2 = requests.post(url, json={"text": "again"}, timeout=30)
        assert json.loads(resp2.content)["value"] == "AGAIN"
    finally:
        query.stop()
        stop_server(name)
