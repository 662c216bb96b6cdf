// Minimal static server for the demo (node demo/server.js [port]).
import { createServer } from "node:http";
import { readFile } from "node:fs/promises";
import { extname, join, normalize } from "node:path";

const root = new URL("..", import.meta.url).pathname;
const types = {
  ".html": "text/html", ".js": "text/javascript", ".onnx": "application/octet-stream",
  ".wasm": "application/wasm", ".json": "application/json",
};
const port = Number(process.argv[2] ?? 8080);

createServer(async (req, res) => {
  const path = normalize(req.url === "/" ? "/demo/index.html" : req.url).replace(/^\/+/, "");
  try {
    const body = await readFile(join(root, path));
    res.writeHead(200, { "content-type": types[extname(path)] ?? "application/octet-stream" });
    res.end(body);
  } catch {
    res.writeHead(404);
    res.end("not found");
  }
}).listen(port, () => console.log(`heybuddy-tpu demo at http://localhost:${port}/`));
