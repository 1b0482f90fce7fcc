"""Minimal in-process S3 endpoint speaking the real wire protocol —
stdlib only (http.server + XML), no installs.

Stands in for the reference CI's MinIO (docker-compose.yml:1-16,
tests/index.test.ts:501) in this container, where the round-9 probe
found: a docker CLIENT now exists but no daemon is reachable
(``Cannot connect to the Docker daemon``), outbound DNS is still dead
(``gaierror -2``), and — new this round — boto3 IS importable. So the
live tier can finally run: real boto3 clients sign real SigV4
requests over real HTTP sockets against this double, which implements
exactly the API subset the tier exercises:

- PutObject (including aws-chunked bodies — boto3 ≥ 1.36 streams
  flexible-checksum uploads as ``Content-Encoding: aws-chunked`` with
  a trailer, so the double decodes the chunk framing),
- HeadObject / HeadBucket (404 via status code, which is all botocore
  needs to shape ClientError.response.ResponseMetadata),
- CreateBucket (409 BucketAlreadyOwnedByYou on repeat) / DeleteBucket
  (409 BucketNotEmpty semantics like MinIO),
- GetObject / DeleteObject,
- ListObjectsV2 with REAL pagination: prefix, max-keys,
  continuation-token (opaque = last key served; resume strictly
  after), KeyCount/IsTruncated/NextContinuationToken — the part
  list_s3 and the distributed lister actually depend on.

NOT an S3 implementation: no auth verification, no versioning, no
multipart. A test double for wire-level integration, same scope as
moto's core — kept to ~200 lines so it is auditable as a fixture.
"""

from __future__ import annotations

import hashlib
import threading
from datetime import datetime, timezone
from email.utils import formatdate
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse
from xml.sax.saxutils import escape

_XMLNS = "http://s3.amazonaws.com/doc/2006-03-01/"


class _Obj:
    __slots__ = ("body", "content_type", "etag", "mtime")

    def __init__(self, body: bytes, content_type: str):
        self.body = body
        self.content_type = content_type
        self.etag = hashlib.md5(body).hexdigest()
        self.mtime = datetime.now(timezone.utc).replace(microsecond=0)


class _Store:
    def __init__(self):
        self.lock = threading.Lock()
        self.buckets: dict[str, dict[str, _Obj]] = {}


def _decode_aws_chunked(raw: bytes) -> bytes:
    """Decode the aws-chunked framing (hex-size;ext\\r\\n data \\r\\n …
    0\\r\\n trailers). Sizes are the only structure we need; trailing
    checksum headers are ignored."""
    out = bytearray()
    i = 0
    while i < len(raw):
        j = raw.index(b"\r\n", i)
        size = int(raw[i:j].split(b";")[0], 16)
        if size == 0:
            break
        out += raw[j + 2 : j + 2 + size]
        i = j + 2 + size + 2
    return bytes(out)


class _Handler(BaseHTTPRequestHandler):
    protocol_version = "HTTP/1.1"
    store: _Store  # set by start_s3_double

    # -- plumbing ----------------------------------------------------
    def log_message(self, *a):  # pragma: no cover - silence
        pass

    def _path_parts(self):
        u = urlparse(self.path)
        parts = u.path.lstrip("/").split("/", 1)
        bucket = unquote(parts[0]) if parts[0] else ""
        key = unquote(parts[1]) if len(parts) > 1 else ""
        return bucket, key, parse_qs(u.query, keep_blank_values=True)

    def _read_body(self) -> bytes:
        n = int(self.headers.get("Content-Length") or 0)
        raw = self.rfile.read(n) if n else b""
        enc = self.headers.get("Content-Encoding", "")
        if "aws-chunked" in enc or self.headers.get(
            "x-amz-content-sha256", ""
        ).startswith("STREAMING"):
            raw = _decode_aws_chunked(raw)
        return raw

    def _send(self, status: int, body: bytes = b"", headers: dict | None = None):
        headers = headers or {}
        self.send_response(status)
        for k, v in headers.items():
            self.send_header(k, v)
        if "Content-Type" not in headers:
            self.send_header("Content-Type", "application/xml")
        if "Content-Length" not in headers:
            self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if self.command != "HEAD" and body:
            self.wfile.write(body)

    def _error(self, status: int, code: str, message: str):
        body = (
            f'<?xml version="1.0" encoding="UTF-8"?><Error><Code>{code}</Code>'
            f"<Message>{escape(message)}</Message></Error>"
        ).encode()
        # HEAD errors must not carry a body (botocore keys off status)
        self._send(status, b"" if self.command == "HEAD" else body)

    # -- verbs -------------------------------------------------------
    def do_PUT(self):
        bucket, key, _ = self._path_parts()
        body = self._read_body()
        st = self.store
        with st.lock:
            if not key:
                if bucket in st.buckets:
                    self._error(
                        409, "BucketAlreadyOwnedByYou", f"{bucket} exists"
                    )
                    return
                st.buckets[bucket] = {}
                self._send(200)
                return
            if bucket not in st.buckets:
                self._error(404, "NoSuchBucket", bucket)
                return
            obj = _Obj(
                body,
                self.headers.get("Content-Type")
                or "application/octet-stream",
            )
            st.buckets[bucket][key] = obj
        self._send(200, headers={"ETag": f'"{obj.etag}"'})

    def do_HEAD(self):
        bucket, key, _ = self._path_parts()
        st = self.store
        with st.lock:
            b = st.buckets.get(bucket)
            if b is None:
                self._error(404, "NoSuchBucket", bucket)
                return
            if not key:
                self._send(200)
                return
            obj = b.get(key)
            if obj is None:
                self._error(404, "NoSuchKey", key)
                return
            self._send(
                200,
                headers={
                    "Content-Type": obj.content_type,
                    "ETag": f'"{obj.etag}"',
                    "Last-Modified": formatdate(
                        obj.mtime.timestamp(), usegmt=True
                    ),
                    "Content-Length": str(len(obj.body)),
                },
            )
            return

    def do_GET(self):
        bucket, key, q = self._path_parts()
        st = self.store
        with st.lock:
            b = st.buckets.get(bucket)
            if b is None:
                self._error(404, "NoSuchBucket", bucket)
                return
            if key:
                obj = b.get(key)
                if obj is None:
                    self._error(404, "NoSuchKey", key)
                    return
                self._send(
                    200,
                    obj.body,
                    headers={
                        "Content-Type": obj.content_type,
                        "ETag": f'"{obj.etag}"',
                        "Last-Modified": formatdate(
                            obj.mtime.timestamp(), usegmt=True
                        ),
                    },
                )
                return
            # ListObjectsV2
            prefix = q.get("prefix", [""])[0]
            max_keys = int(q.get("max-keys", ["1000"])[0])
            token = q.get("continuation-token", [None])[0]
            keys = sorted(k for k in b if k.startswith(prefix))
            if token is not None:
                keys = [k for k in keys if k > token]
            page, rest = keys[:max_keys], keys[max_keys:]
            parts = [
                f'<?xml version="1.0" encoding="UTF-8"?>'
                f'<ListBucketResult xmlns="{_XMLNS}">'
                f"<Name>{escape(bucket)}</Name>"
                f"<Prefix>{escape(prefix)}</Prefix>"
                f"<KeyCount>{len(page)}</KeyCount>"
                f"<MaxKeys>{max_keys}</MaxKeys>"
                f"<IsTruncated>{'true' if rest else 'false'}</IsTruncated>"
            ]
            if rest:
                parts.append(
                    f"<NextContinuationToken>{escape(page[-1])}"
                    f"</NextContinuationToken>"
                )
            for k in page:
                o = b[k]
                parts.append(
                    f"<Contents><Key>{escape(k)}</Key>"
                    f"<LastModified>{o.mtime.isoformat().replace('+00:00', '.000Z')}</LastModified>"
                    f'<ETag>&quot;{o.etag}&quot;</ETag>'
                    f"<Size>{len(o.body)}</Size>"
                    f"<StorageClass>STANDARD</StorageClass></Contents>"
                )
            parts.append("</ListBucketResult>")
            self._send(200, "".join(parts).encode())

    def do_DELETE(self):
        bucket, key, _ = self._path_parts()
        st = self.store
        with st.lock:
            b = st.buckets.get(bucket)
            if b is None:
                self._error(404, "NoSuchBucket", bucket)
                return
            if key:
                b.pop(key, None)  # S3 delete is idempotent: 204 either way
                self._send(204)
                return
            if b:
                self._error(409, "BucketNotEmpty", bucket)
                return
            del st.buckets[bucket]
        self._send(204)

    def do_POST(self):  # pragma: no cover - not used by the tier
        self._error(501, "NotImplemented", "test double")


def start_s3_double() -> str:
    """Start the double on an ephemeral 127.0.0.1 port (daemon thread,
    dies with the process) and return its endpoint URL."""
    store = _Store()
    handler = type("BoundS3Handler", (_Handler,), {"store": store})
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
    srv.daemon_threads = True
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return f"http://127.0.0.1:{srv.server_address[1]}"


if __name__ == "__main__":  # manual smoke: python tests/s3double.py
    url = start_s3_double()
    print(url)
    threading.Event().wait()
