#!/usr/bin/env node
// Single-threaded Node baseline for the GeoNames transform, written
// dependency-free so it can run here (the reference's npm deps are not
// installable in this environment). It re-expresses the reference's
// per-row semantics — positional TSV parse, OR-of-equality template
// filter, longest-prefix type classification (drop unmatched),
// exactly-3-truthy admin-code relation derivation with self-parent
// fallback, NDJSON envelopes — in the same single-threaded, row-at-a-time
// execution model (geonames.js:239–252). Used by docs/THROUGHPUT.md as
// the "reference-shaped single-node" number; this is an original
// implementation, not code from the reference.
//
// Usage: node reference_proxy.js <stageDir> <outFile>
'use strict';
const fs = require('fs');
const path = require('path');
const readline = require('readline');

const COLS = ['geonameid', 'name', 'asciiname', 'alternatenames', 'latitude',
  'longitude', 'featureClass', 'featureCode', 'countryCode', 'cc2',
  'admin1Code', 'admin2Code', 'admin3Code', 'admin4Code', 'population',
  'elevation', 'dem', 'timezone', 'modificationDate'];
const ADMIN_KEYS = ['countryCode', 'admin1Code', 'admin2Code', 'admin3Code', 'admin4Code'];
const BASE_URI = 'http://sws.geonames.org/';

// Same workload config as graft.tools.GeoBench
const FILTERS = [];
for (let i = 0; i < 25; i++) FILTERS.push({ countryCode: 'C' + String(i).padStart(2, '0') });
const TYPES = { PPL: 'hg:Place', ADM: 'hg:Admin', S: 'hg:Spot' };
const LIES_IN = 'hg:liesIn';

function readAdminCodes(file) {
  const map = {};
  const data = fs.readFileSync(file, 'utf8');
  for (const line of data.split('\n')) {
    if (!line) continue;
    const parts = line.split('\t');
    map[parts[0]] = { code: parts[0], geonameid: parts[3] };
  }
  return map;
}

function classify(featureCode) {
  let fc = featureCode;
  while (fc.length > 0) {
    const t = TYPES[fc];
    if (t) return t;
    fc = fc.slice(0, -1);
  }
  return undefined;
}

function matchesFilters(row) {
  for (const f of FILTERS) {
    let ok = true;
    for (const k in f) if (row[k] !== f[k]) { ok = false; break; }
    if (ok) return true;
  }
  return false;
}

async function main() {
  const [stageDir, outFile] = process.argv.slice(2);
  const admin1 = readAdminCodes(path.join(stageDir, 'admin1CodesASCII.txt'));
  const admin2 = readAdminCodes(path.join(stageDir, 'admin2Codes.txt'));

  const acDir = path.join(stageDir, 'ac');
  const files = fs.statSync(acDir).isDirectory()
    ? fs.readdirSync(acDir).filter(f => !f.startsWith('.') && !f.startsWith('_'))
        .sort().map(f => path.join(acDir, f))
    : [acDir];

  const out = fs.createWriteStream(outFile);
  const t0 = process.hrtime.bigint();
  let inRows = 0, outRows = 0;

  for (const file of files) {
    const rl = readline.createInterface({
      input: fs.createReadStream(file, 'utf8'), crlfDelay: Infinity });
    for await (const line of rl) {
      if (!line) continue;
      inRows++;
      const parts = line.split('\t');
      const row = {};
      for (let i = 0; i < COLS.length; i++) row[COLS[i]] = parts[i];
      if (!matchesFilters(row)) continue;
      const type = classify(row.featureCode);
      if (!type) continue;
      const pit = {
        uri: BASE_URI + row.geonameid,
        name: row.name,
        type,
        geometry: { type: 'Point',
          coordinates: [parseFloat(row.longitude), parseFloat(row.latitude)] },
        data: { featureClass: row.featureClass, featureCode: row.featureCode,
          countryCode: row.countryCode, cc2: row.cc2,
          admin1Code: row.admin1Code, admin2Code: row.admin2Code,
          admin3Code: row.admin3Code, admin4Code: row.admin4Code }
      };
      let ok = out.write(JSON.stringify({ type: 'pit', obj: pit }) + '\n');
      outRows++;
      // relations: exactly 3 truthy admin values
      const codes = [];
      for (const k of ADMIN_KEYS) if (row[k]) codes.push(row[k]);
      if (codes.length === 3) {
        let parent = admin2[codes.join('.')];
        if (parent && parent.geonameid === row.geonameid)
          parent = admin1[codes.slice(0, 2).join('.')];
        if (parent) {
          ok = out.write(JSON.stringify({ type: 'relation', obj: {
            from: BASE_URI + row.geonameid, to: BASE_URI + parent.geonameid,
            type: LIES_IN } }) + '\n');
          outRows++;
        }
      }
      if (!ok) await new Promise(res => out.once('drain', res));
    }
  }
  await new Promise(res => out.end(res));
  const sec = Number(process.hrtime.bigint() - t0) / 1e9;
  console.log(JSON.stringify({ metric: 'reference_proxy_transform',
    input_rows: inRows, output_rows: outRows, sec,
    rows_per_sec: Math.round(inRows / sec) }));
}

main();
