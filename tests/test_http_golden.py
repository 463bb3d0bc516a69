"""$http behavior parity with the reference's golden corpus
(src/test/resources/http{1..9} replayed by TestHttp.java:143-148).

The nine golden triples pin: unwind over single/multi/empty array responses,
single-element JSON-array unwrapping in non-unwind mode (Http.java:370-375),
text-vs-JSON content-type handling (Http.java:99-105, 340-344), 404 ->
httpError with a null body (Http.java:131-141), and error survival through
unwind.  We re-express the same behaviors against a deterministic in-process
transport instead of the reference's Netty echo server.
"""

import json

import pytest

from pincette_mongo_streams_spark.context import Context
from pincette_mongo_streams_spark import compile_pipeline


# one route per golden scenario; url suffix selects the response
_ROUTES = {
    "single_object": {"status": 200, "contentType": "application/json",
                      "body": json.dumps({"resource": "resource1"})},
    "two_objects": {"status": 200, "contentType": "application/json",
                    "body": json.dumps([{"n": 1}, {"n": 2}])},
    "one_elem_array": {"status": 200, "contentType": "application/json",
                       "body": json.dumps([{"only": True}])},
    "empty_array": {"status": 200, "contentType": "application/json",
                    "body": "[]"},
    "mixed_array": {"status": 200, "contentType": "application/json",
                    "body": json.dumps([{"n": 1}, 42, "x", {"n": 2}])},
    "not_found": {"status": 404, "contentType": "", "body": ""},
    "plain_text": {"status": 200, "contentType": "text/plain", "body": "test"},
    "form_mime": {"status": 200,
                  "contentType": "application/x-www-form-urlencoded",
                  "body": "a=1&b=2"},
    "binary": {"status": 200, "contentType": "application/octet-stream",
               "body": "\x00\x01"},
}


def _run(spark, resources, unwind):
    routes = dict(_ROUTES)  # captured by value so workers can unpickle

    def transport(req):
        return dict(routes[req["url"].rsplit("/", 1)[1]])

    df = spark.createDataFrame(
        [(f"message{i}", r) for i, r in enumerate(resources, 1)],
        "_id string, resource string")
    ctx = Context(spark=spark, http_transport=transport)
    pipeline = [{"$http": {
        "url": {"$concat": ["http://svc/", "$resource"]},
        "method": "GET", "as": "result", "unwind": unwind,
    }}]
    return [r.asDict(recursive=True)
            for r in compile_pipeline(pipeline, ctx)(df).collect()]


def test_unwind_single_object_per_message(spark):
    # http1: each response is one object -> one output per message,
    # result = the object (as a JSON string on our fixed-schema engine)
    out = _run(spark, ["single_object", "single_object"], unwind=True)
    assert len(out) == 2
    assert [json.loads(r["result"]) for r in out] == [
        {"resource": "resource1"}, {"resource": "resource1"}]
    assert all(r["httpError"] is None for r in out)


def test_unwind_multi_and_empty(spark):
    # http2: two-element array -> two outputs for that message; an empty
    # array -> that message disappears (Http.java:506-507)
    out = _run(spark, ["two_objects", "empty_array"], unwind=True)
    assert [r["_id"] for r in out] == ["message1", "message1"]
    assert [json.loads(r["result"]) for r in out] == [{"n": 1}, {"n": 2}]


def test_non_unwind_array_kept_whole(spark):
    # http3: unwind false -> the whole array lands in `result`
    out = _run(spark, ["two_objects"], unwind=False)
    assert json.loads(out[0]["result"]) == [{"n": 1}, {"n": 2}]


def test_single_element_array_unwrapped(spark):
    # http4 / Http.java:370-375: a one-element JSON array is unwrapped to
    # the element itself in non-unwind mode
    out = _run(spark, ["one_elem_array"], unwind=False)
    assert json.loads(out[0]["result"]) == {"only": True}


def test_error_survives_unwind(spark):
    # http5: 404 under unwind still emits the message, with
    # httpError {statusCode, body: null} and no result
    out = _run(spark, ["not_found"], unwind=True)
    assert len(out) == 1
    assert out[0]["result"] is None
    assert out[0]["httpError"] == {"statusCode": 404, "body": None}


def test_text_content_types_give_strings(spark):
    # http6 (text/plain) and http7 (a TEXT_MIME_TYPES member): the raw
    # body string lands in `result`
    out = _run(spark, ["plain_text", "form_mime"], unwind=False)
    assert [r["result"] for r in out] == ["test", "a=1&b=2"]


def test_other_content_types_give_null(spark):
    # Http.java:354-356 withoutResponseBody: neither JSON nor text -> no body
    out = _run(spark, ["binary"], unwind=False)
    assert out[0]["result"] is None
    assert out[0]["httpError"] is None


def test_unwind_text_body_passes_message_through(spark):
    # withResponseBody orElseGet (Http.java:538-545): under unwind a
    # non-JSON success emits the single original message with no body —
    # it is NOT dropped, and text is never parsed as a JSON array
    out = _run(spark, ["plain_text", "binary"], unwind=True)
    assert [r["_id"] for r in out] == ["message1", "message2"]
    assert all(r["result"] is None for r in out)
    assert all(r["httpError"] is None for r in out)


def test_non_object_array_elements_filtered(spark):
    # responseBodyPublisher filter(isObject) (Http.java:409-416): scalars
    # inside a JSON array response are dropped before unwind/unwrap
    out = _run(spark, ["mixed_array"], unwind=True)
    assert [json.loads(r["result"]) for r in out] == [{"n": 1}, {"n": 2}]
    out = _run(spark, ["mixed_array"], unwind=False)
    assert json.loads(out[0]["result"]) == [{"n": 1}, {"n": 2}]


def test_transport_errors_retry_then_succeed(spark):
    # Util.java:130-148 retry-forever on transport errors: the call is
    # retried (bounded here, then the task fails for Spark to retry) —
    # a transient outage never becomes an httpError
    fails = [2]  # first two attempts fail (worker-side closure state)

    def flaky(req):
        if fails[0] > 0:
            fails[0] -= 1
            raise ConnectionError("transient")
        return {"status": 200, "contentType": "application/json",
                "body": json.dumps({"ok": True})}

    df = spark.createDataFrame([("m1",)], "_id string").repartition(1)
    ctx = Context(spark=spark, http_transport=flaky)
    out = compile_pipeline(
        [{"$http": {"url": {"$concat": ["http://svc/", "$_id"]},
                    "method": "GET", "as": "result",
                    "retries": 3, "retryIntervalMs": 10}}], ctx
    )(df).collect()
    assert json.loads(out[0]["result"]) == {"ok": True}
    assert out[0]["httpError"] is None


def test_transport_errors_exhaust_retries_fail_task(spark):
    # after the bounded retries the task fails (Spark-level retry takes
    # over) instead of fabricating an httpError
    def always_down(req):
        raise ConnectionError("down")

    df = spark.createDataFrame([("m1",)], "_id string").repartition(1)
    ctx = Context(spark=spark, http_transport=always_down)
    with pytest.raises(Exception):
        compile_pipeline(
            [{"$http": {"url": {"$concat": ["http://svc/", "$_id"]},
                        "method": "GET", "as": "result",
                        "retries": 1, "retryIntervalMs": 10}}], ctx
        )(df).collect()


def test_retry_forever_survives_long_outage(spark):
    # retries: -1 = the reference's tryToGetForever (Util.java:47): the
    # call never gives up; a 10-failure outage ends in success, not a
    # task failure
    fails = [10]

    def flaky(req):
        if fails[0] > 0:
            fails[0] -= 1
            raise ConnectionError("transient")
        return {"status": 200, "contentType": "application/json",
                "body": json.dumps({"ok": True})}

    df = spark.createDataFrame([("m1",)], "_id string").repartition(1)
    ctx = Context(spark=spark, http_transport=flaky)
    out = compile_pipeline(
        [{"$http": {"url": {"$concat": ["http://svc/", "$_id"]},
                    "method": "GET", "as": "result",
                    "retries": -1, "retryIntervalMs": 1}}], ctx
    )(df).collect()
    assert json.loads(out[0]["result"]) == {"ok": True}


def test_unparseable_url_bad_request(spark):
    # Http.java:111-113: url that can't be executed -> httpError 400,
    # message passes through
    def boom(req):
        raise ValueError("bad url")

    df = spark.createDataFrame([("m1",)], "_id string")
    ctx = Context(spark=spark, http_transport=boom)
    out = compile_pipeline(
        [{"$http": {"url": "$_id", "method": "GET", "as": "result"}}], ctx
    )(df).collect()
    assert out[0]["result"] is None
    assert out[0]["httpError"]["statusCode"] == 400
