#!/usr/bin/env node
'use strict';
// Drive the ACTUAL reference implementation's transform step
// (geonames.js, module.exports.steps[1]) over a staged fixture dir,
// writing each envelope as one JSON line. Run with
//   NODE_PATH=<shims> node run_reference.js <fixtureDir> <outFile> [mode]
// plus REFPARITY_GEONAMES_JS pointing at the reference module (defaults
// to /root/reference/geonames.js; the sandboxed gate runs a
// sha256-verified copy under an unprivileged uid — see refparity.py).
// The shims provide only the generic library plumbing (highland/ramda
// subsets; request/yauzl load-time stubs) — every domain decision
// (column map, template filters, extra-URI whitelist, longest-prefix
// classification, relation derivation, envelope construction) executes
// from the reference file itself, unmodified. The writer is external to
// the reference (supplied by the host framework in the original), so its
// JSON.stringify-per-envelope form is the contract boundary, not a shim
// of reference code. Output is flushed in batches as the stream runs
// (the original writer is also incremental), so an 8M-row dump needs
// constant memory.
//
// Modes: default    — {countryCode: 'US'} filter, spec types, extra-uris
//        nofilters  — config.filters = [] (geonames.js:243-245 edge)
//        geobench   — the exact graft.tools.GeoBench config: 25-country
//                     template filters, {PPL,ADM,S} prefix types, no
//                     extra-uris (full-dump parity scale)
const fs = require('fs');
const path = require('path');

const refPath = process.env.REFPARITY_GEONAMES_JS || '/root/reference/geonames.js';
const ref = require(refPath);
const transform = ref.steps[1];

const fixtureDir = process.argv[2];
const outFile = process.argv[3];
const mode = process.argv[4] || 'default';

let config;
if (mode === 'geobench') {
  const filters = [];
  for (let i = 0; i < 25; i++) {
    filters.push({ countryCode: 'C' + String(i).padStart(2, '0') });
  }
  config = {
    types: { PPL: 'hg:Place', ADM: 'hg:Admin', S: 'hg:Spot' },
    filters,
    relations: { liesIn: 'hg:liesIn' },
  };
} else {
  config = {
    types: { PPL: 'hg:Place', ADM2: 'hg:Municipality', S: 'hg:Spot' },
    filters: mode === 'nofilters' ? [] : [{ countryCode: 'US' }],
    relations: { liesIn: 'hg:liesIn' },
    extraUris: path.join(fixtureDir, 'extra-uris.json'),
  };
}

const fd = fs.openSync(outFile, 'w');
let batch = [];
let nLines = 0;
function flush() {
  if (batch.length) {
    fs.writeSync(fd, batch.join('\n') + '\n');
    batch = [];
  }
}
const writer = {
  writeObjects(data, cb) {
    for (const el of data) {
      batch.push(JSON.stringify(el));
      nLines++;
    }
    if (batch.length >= 8192) flush();
    cb(null);
  },
};

transform(config, { previous: fixtureDir }, { writer }, (err) => {
  flush();
  fs.closeSync(fd);
  if (err) {
    console.log(JSON.stringify({
      status: 'error',
      name: err && err.constructor ? err.constructor.name : typeof err,
      message: String(err && err.message),
      stack: String(err && err.stack).split('\n').slice(0, 3),
      lines_before_error: nLines,
    }));
    process.exit(3);
  }
  console.log(JSON.stringify({ status: 'ok', lines: nLines }));
});
