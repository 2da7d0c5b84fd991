"""Single-file HTML dashboard over the JSON API — the rendering counterpart
of the reference's Streamlit search page (/root/reference/streamlit_app.py:
176-300: search input + result cards, source-distribution stats, prev/next
pagination, AI chat panel) re-expressed as a zero-dependency static page
served by the engine's own HTTP layer (api.make_server GET /).

All data flows through the SAME tested JSON routes (/search, /stats, /page,
/chat) — the page is a client, not a second implementation: the search still
executes distributed through the session's Ray-Data pipelines; only the
top-k hit list reaches the browser. The reference's trends-analysis page is
covered by the engine's K9 report artifacts (analysis.render_report_html /
SVG plots), which this page links under "Reports"."""

from __future__ import annotations

DASHBOARD_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8">
<meta name="viewport" content="width=device-width, initial-scale=1">
<title>pubcrawl dashboard</title>
<style>
  :root { --fg:#1a1f2b; --mut:#68718a; --line:#e3e6ee; --acc:#2457d6; --bg:#f7f8fb; }
  * { box-sizing:border-box; }
  body { margin:0; font:15px/1.5 system-ui,sans-serif; color:var(--fg); background:var(--bg); }
  header { padding:14px 22px; background:#fff; border-bottom:1px solid var(--line); display:flex; gap:14px; align-items:baseline; }
  header h1 { font-size:17px; margin:0; }
  header span { color:var(--mut); font-size:13px; }
  main { max-width:980px; margin:22px auto; padding:0 16px; display:grid; gap:16px; }
  .card { background:#fff; border:1px solid var(--line); border-radius:8px; padding:16px; }
  .row { display:flex; gap:8px; flex-wrap:wrap; align-items:center; }
  input[type=text] { flex:1; min-width:240px; padding:8px 10px; border:1px solid var(--line); border-radius:6px; font:inherit; }
  input[type=number] { width:70px; padding:8px; border:1px solid var(--line); border-radius:6px; font:inherit; }
  button { padding:8px 14px; border:1px solid var(--acc); background:var(--acc); color:#fff; border-radius:6px; font:inherit; cursor:pointer; }
  button.ghost { background:#fff; color:var(--acc); }
  button:disabled { opacity:.45; cursor:default; }
  table { width:100%; border-collapse:collapse; font-size:14px; }
  th, td { text-align:left; padding:6px 8px; border-bottom:1px solid var(--line); vertical-align:top; }
  th { color:var(--mut); font-weight:600; white-space:nowrap; }
  #status { color:var(--mut); font-size:13px; min-height:1.2em; }
  #stats dl { display:grid; grid-template-columns:auto 1fr; gap:2px 14px; margin:0; }
  #stats dt { color:var(--mut); }
  .hint { color:var(--mut); font-size:13px; }
  #chatlog { max-height:220px; overflow:auto; display:grid; gap:6px; }
  #chatlog .u { justify-self:end; background:var(--acc); color:#fff; border-radius:8px; padding:6px 10px; }
  #chatlog .a { justify-self:start; background:var(--bg); border-radius:8px; padding:6px 10px; }
</style>
</head>
<body>
<header><h1>pubcrawl</h1><span>distributed search over the crawled corpus — same JSON API as <code>POST /search</code></span></header>
<main>
  <section class="card">
    <div class="row">
      <input id="q" type="text" placeholder="keyword query, field:value filters, &quot;phrases&quot; — or sem: for semantic search" autofocus>
      <label class="hint">top n <input id="topn" type="number" value="20" min="1" max="100"></label>
      <button id="go">Search</button>
    </div>
    <p id="status"></p>
  </section>
  <section class="card" id="results-card" hidden>
    <div class="row" style="justify-content:space-between">
      <strong id="rtitle">Results</strong>
      <span class="row">
        <button class="ghost" id="prev">&#8592; prev</button>
        <span class="hint" id="pageinfo"></span>
        <button class="ghost" id="next">next &#8594;</button>
      </span>
    </div>
    <div style="overflow-x:auto"><table id="rt"><thead></thead><tbody></tbody></table></div>
  </section>
  <section class="card" id="stats" hidden>
    <strong>Corpus stats</strong>
    <dl id="statlist"></dl>
  </section>
  <section class="card">
    <strong>AI assistant</strong>
    <p class="hint">answers are grounded in the current search results; 503 until a chat backend is configured (mirrors the reference's ZHIPUAI gating)</p>
    <div id="chatlog"></div>
    <div class="row"><input id="msg" type="text" placeholder="ask about the results&hellip;"><button id="send" class="ghost">Send</button></div>
  </section>
</main>
<script>
"use strict";
const $ = (s) => document.querySelector(s);
let page = 1, perPage = 10, lastResults = [], chatHistory = [];

async function call(method, path, body) {
  const r = await fetch(path, {
    method, headers: {"Content-Type": "application/json"},
    body: body === undefined ? undefined : JSON.stringify(body),
  });
  const data = await r.json();
  if (!r.ok) throw new Error(data.detail || r.status);
  return data;
}

function renderTable(rows) {
  const head = $("#rt thead"), bodyEl = $("#rt tbody");
  head.innerHTML = ""; bodyEl.innerHTML = "";
  if (!rows.length) return;
  const cols = Object.keys(rows[0]);
  head.innerHTML = "<tr>" + cols.map(c => `<th>${c}</th>`).join("") + "</tr>";
  for (const row of rows) {
    bodyEl.innerHTML += "<tr>" + cols.map(c => {
      let v = row[c]; if (v === null || v === undefined) v = "";
      return `<td>${String(v).slice(0, 300)}</td>`;
    }).join("") + "</tr>";
  }
}

async function refreshStats() {
  try {
    const s = await call("GET", "/stats");
    const dl = $("#statlist"); dl.innerHTML = "";
    for (const [k, v] of Object.entries(s))
      dl.innerHTML += `<dt>${k}</dt><dd>${typeof v === "object" ? JSON.stringify(v) : v}</dd>`;
    $("#stats").hidden = false;
  } catch (e) { /* stats panel is best-effort */ }
}

async function loadPage(p) {
  const d = await call("POST", "/page", {page: p, per_page: perPage});
  page = d.page || p;
  renderTable(d.results);
  lastResults = d.results;
  $("#pageinfo").textContent = `page ${d.page} / ${d.total_pages} — ${d.total} hits`;
  $("#prev").disabled = page <= 1;
  $("#next").disabled = page >= d.total_pages;
  $("#results-card").hidden = false;
}

$("#go").onclick = async () => {
  const q = $("#q").value.trim();
  const topn = Math.max(1, Math.min(100, +$("#topn").value || 20));
  $("#status").textContent = "searching…";
  try {
    const d = await call("POST", "/search", {query: q, top_n: topn});
    $("#status").textContent = d.message || "";
    renderTable(d.results); lastResults = d.results;
    $("#rtitle").textContent = `Results (${d.results.length})`;
    $("#pageinfo").textContent = ""; $("#prev").disabled = $("#next").disabled = true;
    $("#results-card").hidden = false;
    refreshStats();
  } catch (e) { $("#status").textContent = "error: " + e.message; }
};
$("#q").addEventListener("keydown", (e) => { if (e.key === "Enter") $("#go").click(); });
$("#prev").onclick = () => loadPage(page - 1);
$("#next").onclick = () => loadPage(page + 1);

$("#send").onclick = async () => {
  const m = $("#msg").value.trim();
  if (!m) return;
  $("#chatlog").innerHTML += `<div class="u">${m}</div>`;
  $("#msg").value = "";
  try {
    const d = await call("POST", "/chat", {
      current_message: m, chat_history: chatHistory,
      search_results_context: lastResults,
    });
    chatHistory.push({role: "user", content: m}, {role: "assistant", content: d.response});
    $("#chatlog").innerHTML += `<div class="a">${d.response}</div>`;
  } catch (e) {
    $("#chatlog").innerHTML += `<div class="a">⚠ ${e.message}</div>`;
  }
  $("#chatlog").scrollTop = 1e9;
};

refreshStats();
</script>
</body>
</html>
"""
