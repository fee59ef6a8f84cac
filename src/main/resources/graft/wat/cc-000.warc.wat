WARC/1.0
WARC-Type: warcinfo
WARC-Date: 2024-01-01T00:00:00Z
Content-Length: 25

software: graft-fixture


WARC/1.0
WARC-Type: metadata
WARC-Target-URI: http://hub.example/start
WARC-Date: 2024-01-01T00:00:00Z
Content-Length: 573

{"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {"Links": [{"path": "A@/href", "text": "Alpha & Co", "url": "http://alpha.example/a"}, {"path": "A@/href", "text": "the local page", "url": "/local/page"}, {"path": "A@/href", "text": "beta list", "url": "http://beta.example/b?q=1"}, {"path": "A@/href", "text": "Alpha & Co", "url": "http://alpha.example/a2"}]}, "Headers": {"Content-Type": "text/html"}, "Response-Message": {"Status": "200"}}}, "WARC-Header-Metadata": {"WARC-Target-URI": "http://hub.example/start", "WARC-Type": "response"}}}

WARC/1.0
WARC-Type: metadata
WARC-Target-URI: http://nolinks.example/t
WARC-Date: 2024-01-01T00:00:00Z
Content-Length: 264

{"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {"HTML-Metadata": {}, "Headers": {"Content-Type": "text/html"}, "Response-Message": {"Status": "200"}}}, "WARC-Header-Metadata": {"WARC-Target-URI": "http://nolinks.example/t", "WARC-Type": "response"}}}

