-- Deploy-time input (reference: itests/tests/base/test_toasted_withold):
-- REPLICA IDENTITY FULL puts the full OLD row image (including the
-- large TOASTed value) on UPDATE old-keys; the unchanged-toast-datum
-- sentinel still appears in the NEW image when the value is untouched.
CREATE TABLE toast_test (id integer PRIMARY KEY, value text, ivalue integer);
INSERT INTO toast_test VALUES (1, 'small text', 1);
INSERT INTO toast_test VALUES (2, repeat('Z', 4000), 1);
ALTER TABLE toast_test REPLICA IDENTITY FULL;
UPDATE toast_test SET ivalue = 2 WHERE id = 1;
UPDATE toast_test SET ivalue = 2 WHERE id = 2;
UPDATE toast_test SET value = 'replaced' WHERE id = 2;
