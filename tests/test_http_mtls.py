"""$http sslContext (client certificates, Http.java:183-198, 254-277):

- full mTLS round-trip against a local HTTPS server that REQUIRES a
  client certificate (CERT_REQUIRED), with the PKCS#12 keyStore form;
- key-store mtime hot-reload: the SSL context is rebuilt when the file
  changes, reused otherwise.
"""

import datetime
import json
import os
import ssl
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from pincette_mongo_streams_spark import Context, compile_pipeline
from pincette_mongo_streams_spark.operators.effects import _ssl_client_context

cryptography = pytest.importorskip("cryptography")

from cryptography import x509  # noqa: E402
from cryptography.hazmat.primitives import hashes, serialization  # noqa: E402
from cryptography.hazmat.primitives.asymmetric import rsa  # noqa: E402
from cryptography.hazmat.primitives.serialization import pkcs12  # noqa: E402
from cryptography.x509.oid import NameOID  # noqa: E402


def _make_cert(common_name, issuer_key=None, issuer_name=None, ca=False):
    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    name = x509.Name([x509.NameAttribute(NameOID.COMMON_NAME, common_name)])
    now = datetime.datetime.now(datetime.timezone.utc)
    builder = (
        x509.CertificateBuilder()
        .subject_name(name)
        .issuer_name(issuer_name or name)
        .public_key(key.public_key())
        .serial_number(x509.random_serial_number())
        .not_valid_before(now - datetime.timedelta(minutes=5))
        .not_valid_after(now + datetime.timedelta(days=1))
        .add_extension(x509.BasicConstraints(ca=ca, path_length=None),
                       critical=True)
    )
    if common_name == "localhost":
        builder = builder.add_extension(
            x509.SubjectAlternativeName([x509.DNSName("localhost")]),
            critical=False)
    cert = builder.sign(issuer_key or key, hashes.SHA256())
    return key, cert


@pytest.fixture(scope="module")
def pki(tmp_path_factory):
    d = tmp_path_factory.mktemp("pki")
    ca_key, ca_cert = _make_cert("test-ca", ca=True)
    srv_key, srv_cert = _make_cert("localhost", issuer_key=ca_key,
                                   issuer_name=ca_cert.subject)
    cli_key, cli_cert = _make_cert("client", issuer_key=ca_key,
                                   issuer_name=ca_cert.subject)
    paths = {
        "ca": str(d / "ca.pem"),
        "srv_cert": str(d / "srv.pem"),
        "srv_key": str(d / "srv.key"),
        "p12": str(d / "client.p12"),
    }
    with open(paths["ca"], "wb") as fh:
        fh.write(ca_cert.public_bytes(serialization.Encoding.PEM))
    with open(paths["srv_cert"], "wb") as fh:
        fh.write(srv_cert.public_bytes(serialization.Encoding.PEM))
    with open(paths["srv_key"], "wb") as fh:
        fh.write(srv_key.private_bytes(
            serialization.Encoding.PEM,
            serialization.PrivateFormat.PKCS8,
            serialization.NoEncryption()))
    with open(paths["p12"], "wb") as fh:
        fh.write(pkcs12.serialize_key_and_certificates(
            b"client", cli_key, cli_cert, None,
            serialization.BestAvailableEncryption(b"secret")))
    return paths


@pytest.fixture(scope="module")
def mtls_server(pki):
    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            peer = self.connection.getpeercert()
            cn = dict(x[0] for x in peer["subject"])["commonName"]
            body = json.dumps({"path": self.path, "client": cn}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    server = HTTPServer(("localhost", 0), Handler)
    sctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    sctx.load_cert_chain(pki["srv_cert"], pki["srv_key"])
    sctx.load_verify_locations(cafile=pki["ca"])
    sctx.verify_mode = ssl.CERT_REQUIRED  # mTLS: client cert mandatory
    server.socket = sctx.wrap_socket(server.socket, server_side=True)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"https://localhost:{server.server_address[1]}"
    server.shutdown()


def test_http_mtls_round_trip(spark, pki, mtls_server):
    ctx = Context(spark=spark)
    pipeline = [
        {"$http": {
            "url": {"$concat": [mtls_server, "/r/", {"$toString": "$r_regionkey"}]},
            "as": "resp", "schema": "struct<path:string,client:string>",
            "sslContext": {"keyStore": pki["p12"], "password": "secret",
                           "trustStore": pki["ca"]},
        }},
        {"$project": {"r_regionkey": 1, "path": "$resp.path",
                      "client": "$resp.client"}},
    ]
    region = spark.read.parquet("/root/testdata/sf0.001/region.parquet")
    rows = compile_pipeline(pipeline, ctx)(region).collect()
    assert len(rows) == region.count()
    assert all(r.client == "client" for r in rows)
    assert sorted(r.path for r in rows) == sorted(
        f"/r/{r.r_regionkey}" for r in rows)


def test_ssl_context_hot_reload(pki):
    spec = {"keyStore": pki["p12"], "password": "secret",
            "trustStore": pki["ca"]}
    state: dict = {}
    first = _ssl_client_context(spec, state)
    assert _ssl_client_context(spec, state) is first  # mtime unchanged
    os.utime(pki["p12"])  # keystore rotated
    assert _ssl_client_context(spec, state) is not first


def test_http_without_client_cert_rejected(spark, pki, mtls_server):
    """The server demands a client certificate: a transport without one
    must fail (and $http retries then surfaces the transport error)."""
    ctx = Context(spark=spark)
    pipeline = [{"$http": {
        "url": {"$concat": [mtls_server, "/x"]}, "as": "resp",
        "schema": "struct<path:string,client:string>",
        "sslContext": {"trustStore": pki["ca"], "certFile": None},
        "retries": 0,
    }}]
    region = spark.read.parquet("/root/testdata/sf0.001/region.parquet").limit(1)
    with pytest.raises(Exception):
        compile_pipeline(pipeline, ctx)(region).collect()
